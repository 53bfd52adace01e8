"""Embedding inference plumbing: text → ``array<float>`` at corpus
scale.

The pattern every embedding-generation job shares, independent of the
model behind it:

- **Arrow-batched** ``mapInPandas`` — the encoder sees whole pandas
  batches (model-friendly), rows never cross Python one at a time;
- **bounded batches** — ``batch_rows`` caps the rows handed to one
  encoder call so activation memory stays fixed regardless of
  partition size (``maxRecordsPerBatch`` is set per-operator, not
  globally);
- **scale-out by repartition** — embedding cost is per-document and
  embarrassingly parallel; the operator never shuffles, so throughput
  is executors × batches/sec.

The runtime image has no model stack, so the actual encoder is
STUBBED, same policy as ``multimodal.py``: ``encoder="real"`` raises
``NotImplementedError`` where a sentence-transformers/torch call goes;
``encoder="fake"`` produces a deterministic md5-seeded unit vector per
text so the plumbing (schema, batching, downstream ANN compatibility)
is exercisable and testable end-to-end.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame


def embed_texts(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    dim: int = 64,
    encoder: str = "fake",
    batch_rows: int = 1024,
) -> DataFrame:
    """(id, embedding array<float>) — one L2-normalized embedding per
    document. Output plugs directly into the ANN operators
    (:mod:`impuls_spark.llm.similarity`)."""
    out_schema = f"{id_col} long, embedding array<float>"

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib

        import numpy as np

        def encode(texts: pd.Series) -> list:
            if encoder == "real":
                raise NotImplementedError(
                    "no model stack in this runtime image; plug "
                    "sentence-transformers / torch inference here"
                )
            vecs = []
            for t in texts:
                # deterministic fake: md5-seeded vector, L2-normalized —
                # stable across engines, partitionings, and runs
                seed = int.from_bytes(
                    hashlib.md5((t or "").encode()).digest()[:8], "big"
                )
                rng = np.random.default_rng(seed)
                v = rng.standard_normal(dim)
                vecs.append((v / np.linalg.norm(v)).astype(np.float32))
            return vecs

        for pdf in it:
            # bound the rows per encoder call: activation memory is
            # O(batch_rows), not O(partition)
            for lo in range(0, len(pdf), batch_rows):
                chunk = pdf.iloc[lo:lo + batch_rows]
                yield pd.DataFrame({
                    id_col: chunk[id_col].values,
                    "embedding": encode(chunk[text_col]),
                })

    return df.select(id_col, text_col).mapInPandas(batches, out_schema)
