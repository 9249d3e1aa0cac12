#!/usr/bin/env python3
"""Mark annotation-less frames ``is_det_keyframe: false`` in a COCO JSON.

Parity spec: /root/reference/data/update_is_det_keyframe.py."""

from __future__ import annotations

import argparse
import json
from pathlib import Path


def update_is_det_keyframe(coco_data: dict, dry_run: bool = False) -> dict:
    with_anns = {a["image_id"] for a in coco_data["annotations"]}
    updated = 0
    for image in coco_data["images"]:
        if image["id"] not in with_anns and image.get("is_det_keyframe", True):
            if not dry_run:
                image["is_det_keyframe"] = False
            updated += 1
    print(f"updated {updated} images to is_det_keyframe=false")
    return coco_data


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("files", nargs="+")
    ap.add_argument("--no-backup", action="store_true")
    ap.add_argument("--dry-run", action="store_true")
    args = ap.parse_args()
    for fp in args.files:
        fp = Path(fp)
        if not args.no_backup and not args.dry_run:
            fp.with_suffix(".json.backup").write_text(fp.read_text())
        data = json.loads(fp.read_text())
        data = update_is_det_keyframe(data, args.dry_run)
        if not args.dry_run:
            fp.write_text(json.dumps(data, indent=2))


if __name__ == "__main__":
    main()
