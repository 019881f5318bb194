#!/bin/sh
exec python "$(dirname "$0")/examples/yolo26n_seg/run.py" "$@"
