#!/bin/bash
# Analogue of the reference's script/run.sh: prove+verify the SHA256_64
# benchmark circuit with reference-style output.
set -e
cd "$(dirname "$0")/.."
exec python -m virgo_plus_tpu run "${1:-/root/reference/data/SHA256_64.pws}"
