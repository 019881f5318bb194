#!/bin/sh
exec python "$(dirname "$0")/examples/supertonic/run.py" "$@"
