#!/usr/bin/env bash
# Real-dependency test lane (VERDICT r7 item 2): install the public
# [real] extra (sentence-transformers, Pillow) into a throwaway venv
# and run the two integration tests that skip when the packages are
# absent — so the import-guarded encoder/codec contracts are exercised
# against the REAL packages, not just their stub-injection twins.
#
# Run on any machine with network access to PyPI:
#     bash scripts/run_real_deps_tests.sh
#
# The CI/workstation lane is intentionally a script, not a pytest
# marker: the benchmark container has no network, so the lane must be
# explicitly reproducible elsewhere rather than silently skipped.
set -euo pipefail
cd "$(dirname "$0")/.."

VENV="${REAL_DEPS_VENV:-.venv-real}"
python -m venv "$VENV"
# shellcheck disable=SC1091
source "$VENV/bin/activate"
pip install --quiet --upgrade pip
pip install --quiet -e ".[dev,real]" pyspark

python - <<'EOF'
import PIL, sentence_transformers
print("Pillow", PIL.__version__,
      "| sentence-transformers", sentence_transformers.__version__)
EOF

# -p no:cacheprovider: leave no state behind in the repo
exec python -m pytest -p no:cacheprovider -v \
    tests/test_llm_ops.py::test_multimodal_real_codec_with_pillow \
    tests/test_llm_ops.py::test_embed_real_encoder_with_sentence_transformers
