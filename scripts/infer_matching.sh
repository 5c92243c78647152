#!/usr/bin/env bash
# Mirror of the reference's infer.sh (matching track).
set -euo pipefail
exec python -m vsc22_tpu.pipelines.matching_cli "$@"
