#!/bin/sh
# Reference overcooked_demo/up.sh: build + start the demo container.
cd "$(dirname "$0")" && docker compose up --build -d "$@"
