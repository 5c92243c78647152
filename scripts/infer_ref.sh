#!/usr/bin/env bash
# Mirror of the reference's infer_ref.sh: per-model reference extraction.
set -euo pipefail
exec python -m vsc22_tpu.pipelines.ref_cli "$@"
