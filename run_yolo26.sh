#!/bin/sh
exec python "$(dirname "$0")/examples/yolo26/run.py" "$@"
