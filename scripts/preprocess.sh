#!/usr/bin/env bash
# Mirror of the reference's preprocess.sh: videos -> 1-fps frame store.
set -euo pipefail
VIDEOS=${1:?usage: preprocess.sh VIDEOS_DIR STORE_PATH}
STORE=${2:?}
python -m vsc22_tpu.pipelines.preprocess --videos "$VIDEOS" --store "$STORE" --fps 1 "${@:3}"
