#!/usr/bin/env bash
# COCO-2017 download helper — same role as the reference
# scripts/prepare_dataset.sh (URL table + download/unzip loop).
# Usage: prepare_dataset.sh <dest_dir> [train|val|annotations|all ...]
set -euo pipefail

DEST="${1:-./dataset/raw}"
shift || true
TARGETS=("${@:-all}")

mkdir -p "$DEST/images" "$DEST/annotations"

url_for() {
  case "$1" in
    train)        echo "http://images.cocodataset.org/zips/train2017.zip" ;;
    val)          echo "http://images.cocodataset.org/zips/val2017.zip" ;;
    test)         echo "http://images.cocodataset.org/zips/test2017.zip" ;;
    annotations)  echo "http://images.cocodataset.org/annotations/annotations_trainval2017.zip" ;;
    stuff)        echo "http://images.cocodataset.org/annotations/stuff_annotations_trainval2017.zip" ;;
    *) echo "unknown target: $1" >&2; return 1 ;;
  esac
}

fetch() {
  local name="$1" url zip
  url="$(url_for "$name")"
  zip="$DEST/$(basename "$url")"
  if [[ ! -f "$zip" ]]; then
    echo "[INFO] downloading $url"
    wget -q --show-progress -O "$zip" "$url"
  fi
  echo "[INFO] unzipping $zip"
  unzip -qo "$zip" -d "$DEST"
}

for t in "${TARGETS[@]}"; do
  case "$t" in
    all) for s in train val annotations stuff; do fetch "$s"; done ;;
    *)   fetch "$t" ;;
  esac
done

# normalize directory names to the config.yaml layout
[[ -d "$DEST/train2017" ]] && mv -n "$DEST/train2017" "$DEST/images/train"
[[ -d "$DEST/val2017"   ]] && mv -n "$DEST/val2017"   "$DEST/images/val"
[[ -d "$DEST/test2017"  ]] && mv -n "$DEST/test2017"  "$DEST/images/test"
echo "[INFO] dataset ready under $DEST"
