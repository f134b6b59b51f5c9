#!/bin/sh
# Reference overcooked_demo/down.sh: stop the demo container.
cd "$(dirname "$0")" && docker compose down "$@"
