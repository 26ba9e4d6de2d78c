#!/usr/bin/env bash
# parity with scripts/tapvid_davis.sh: unpack the TAP-Vid DAVIS pickle
set -e
python -m gflow_tpu.cli.split_tapvid --pkl-path "${1:?tapvid pkl}" --out-root "${2:?out root}"
