#!/usr/bin/env sh
set -e
exec python -m voitta_rag_tpu.api.app
