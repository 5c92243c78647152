#!/usr/bin/env bash
# Mirror of the reference's infer_query.sh: flagship query extraction.
set -euo pipefail
exec python -m vsc22_tpu.pipelines.query_cli "$@"
