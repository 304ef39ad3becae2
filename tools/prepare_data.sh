#!/bin/bash
# Fetch and unpack LibriSpeech dev-clean / test-clean into data/
# (counterpart of the reference's prepare_data.sh).
set -euo pipefail

DATA_DIR="${1:-data}"
BASE_URL="http://www.openslr.org/resources/12"

mkdir -p "$DATA_DIR"
cd "$DATA_DIR"

for part in dev-clean test-clean; do
    if [ -d "LibriSpeech/$part" ]; then
        echo "LibriSpeech/$part already present, skipping"
        continue
    fi
    echo "Downloading $part ..."
    wget -c "$BASE_URL/$part.tar.gz"
    tar -xzf "$part.tar.gz"
    rm -f "$part.tar.gz"
done

echo "Done. Point training_dataset_dirs / test_dataset_dirs at:"
echo "  $DATA_DIR/LibriSpeech/dev-clean"
echo "  $DATA_DIR/LibriSpeech/test-clean"
