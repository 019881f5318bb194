#!/bin/sh
exec python "$(dirname "$0")/examples/sensevoice/run.py" "$@"
