#!/usr/bin/env bash
# Mirror of the reference's matching-track training entry.
set -euo pipefail
exec python -m vsc22_tpu.train.matching_cli "$@"
