#!/bin/sh
# Silero VAD runner (parity surface: reference run_silero.sh)
exec python "$(dirname "$0")/examples/silero/run.py" "$@"
