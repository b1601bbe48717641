#!/usr/bin/env bash
# Dataset fetcher (parity: download_data.sh): pulls the Jrender competition
# dataset + B-board test transforms into ./data. Requires network access.
set -e
mkdir -p data
echo "Fetching Jrender dataset (Coffee, Scar, Scarf, Car, Easyship)..."
wget -q https://cloud.tsinghua.edu.cn/f/8d9466e0e6a74eb49a12/?dl=1 -O data.zip
unzip -q -o data.zip -d data
rm -f data.zip
echo "Done. Scenes under ./data/<Scene>/transforms_{train,val,test}.json"
