#!/usr/bin/env python
"""YOLO26n-seg runner: JPEG → detections + instance masks.

Surface parity: /root/reference/examples/yolo26n-seg (mask coefficient +
prototype composition, SURVEY.md §2.5)."""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[2]))

from examples.yolo26.run import run  # noqa: E402

if __name__ == "__main__":
    run(segmentation=True)
