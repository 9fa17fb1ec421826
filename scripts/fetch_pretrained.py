#!/usr/bin/env python
"""Hash-verified fetcher for the pretrained checkpoints the pipeline expects.

The reference initializes detectors from COCO-pretrained mm checkpoints
(``load_from`` in every config, e.g.
``data_annotation/configs/Real_Source/faster-rcnn.py:37``) and fine-tunes
Stable Diffusion v1.4. This deployment is typically ZERO-EGRESS: the script
refuses to touch the network unless ``--allow-download`` is passed, and in
either mode verifies the sha256 of whatever lands in (or already sits in)
the target directory, so provenance is checked even for sneakernet-copied
files.

Usage:
    python scripts/fetch_pretrained.py --what yolov8 --dest /ckpts \
        [--allow-download]
    python scripts/fetch_pretrained.py --verify /ckpts/yolov8_m_coco.pth

Then train with:
    python -m agenda_tpu.cli.det_train --preset real_source --detector yolov8 \
        --pretrained /ckpts/yolov8_m_coco.pth ...
"""

from __future__ import annotations

import argparse
import hashlib
import os
import sys

# (url, sha256, local name). URLs are the reference's own load_from targets;
# hashes pin the exact artifacts the reference trained from. An empty hash
# means "record on first verified use" (upstream file, hash not republished).
CHECKPOINTS = {
    "faster-rcnn": dict(
        url="https://download.openmmlab.com/mmdetection/v2.0/faster_rcnn/"
            "faster_rcnn_r50_fpn_2x_coco/"
            "faster_rcnn_r50_fpn_2x_coco_bbox_mAP-0.384_20200504_210434-a5d8aa15.pth",
        sha256="a5d8aa15",  # mm convention: hash prefix embedded in filename
        name="faster_rcnn_r50_fpn_2x_coco.pth",
    ),
    "yolov5": dict(
        url="https://download.openmmlab.com/mmyolo/v0/yolov5/"
            "yolov5_m-v61_syncbn_fast_8xb16-300e_coco/"
            "yolov5_m-v61_syncbn_fast_8xb16-300e_coco_20220917_204944-516a710f.pth",
        sha256="516a710f",
        name="yolov5_m_coco.pth",
    ),
    "yolov8": dict(
        url="https://download.openmmlab.com/mmyolo/v0/yolov8/"
            "yolov8_m_syncbn_fast_8xb16-500e_coco/"
            "yolov8_m_syncbn_fast_8xb16-500e_coco_20230115_192200-c22e560a.pth",
        sha256="c22e560a",
        name="yolov8_m_coco.pth",
    ),
    "vitdet": dict(
        url="https://download.openmmlab.com/mmdetection/v3.0/vitdet/"
            "vitdet_mask-rcnn_vit-b-mae_lsj-100e/"
            "vitdet_mask-rcnn_vit-b-mae_lsj-100e_20230328_153519-e15fe294.pth",
        sha256="e15fe294",
        name="vitdet_vit_b_mae_coco.pth",
    ),
    "resnet50": dict(
        url="https://download.pytorch.org/models/resnet50-0676ba61.pth",
        sha256="0676ba61",
        name="resnet50_imagenet.pth",
    ),
}


def sha256_of(path: str) -> str:
    h = hashlib.sha256()
    with open(path, "rb") as f:
        for chunk in iter(lambda: f.read(1 << 20), b""):
            h.update(chunk)
    return h.hexdigest()


def verify(path: str, expected_prefix: str) -> bool:
    """mm/torchvision convention: the filename embeds the first 8 hex chars
    of the file's sha256; verify against that prefix."""
    digest = sha256_of(path)
    ok = digest.startswith(expected_prefix)
    print(f"{path}: sha256={digest[:16]}... expected prefix {expected_prefix}: "
          f"{'OK' if ok else 'MISMATCH'}")
    return ok


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__,
                                formatter_class=argparse.RawDescriptionHelpFormatter)
    p.add_argument("--what", choices=sorted(CHECKPOINTS) + ["all"], default=None)
    p.add_argument("--dest", type=str, default="checkpoints")
    p.add_argument("--allow-download", action="store_true",
                   help="Explicitly permit network access (off by default: "
                        "zero-egress deployments).")
    p.add_argument("--verify", type=str, default=None,
                   help="Verify an existing file against the known hash for "
                        "its checkpoint name.")
    args = p.parse_args(argv)

    if args.verify:
        base = os.path.basename(args.verify)
        for spec in CHECKPOINTS.values():
            if spec["name"] == base or spec["url"].endswith(base):
                return 0 if verify(args.verify, spec["sha256"]) else 1
        print(f"unknown checkpoint file name: {base}", file=sys.stderr)
        return 2

    if not args.what:
        p.error("--what or --verify required")
    keys = sorted(CHECKPOINTS) if args.what == "all" else [args.what]
    os.makedirs(args.dest, exist_ok=True)
    rc = 0
    for key in keys:
        spec = CHECKPOINTS[key]
        out = os.path.join(args.dest, spec["name"])
        if os.path.exists(out):
            if not verify(out, spec["sha256"]):
                rc = 1
            continue
        if not args.allow_download:
            print(f"{key}: {out} missing and --allow-download not set "
                  f"(zero-egress mode). Copy the file in manually from:\n"
                  f"  {spec['url']}", file=sys.stderr)
            rc = 1
            continue
        import urllib.request

        print(f"downloading {spec['url']} -> {out}")
        urllib.request.urlretrieve(spec["url"], out)
        if not verify(out, spec["sha256"]):
            os.remove(out)
            rc = 1
    return rc


if __name__ == "__main__":
    raise SystemExit(main())
