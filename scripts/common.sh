#!/usr/bin/env bash
# Shared plumbing for the launch scripts: all of them accept
#   ./script.sh CLASS [extra flags...]
# (no GPU argument -- device selection is automatic on TPU).
set -e
cd "$(dirname "$0")/.."
