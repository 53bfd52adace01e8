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

Integration contract (the "real" encoder)
-----------------------------------------

``encoder`` is either a string mode or a **callable**:

- ``"fake"`` (default): deterministic md5-seeded unit vector per text,
  so the plumbing (schema, batching, downstream ANN compatibility) is
  exercisable and testable end-to-end in an image with no model stack;
- ``"real"``: the public ``sentence-transformers`` package behind an
  import guard — loads ``model_name`` once per executor worker
  (module-level cache), encodes each Arrow batch, L2-normalizes to
  float32. Raises a descriptive ``ImportError`` when the package is
  absent (this runtime image does not ship it; the integration test
  skips cleanly). Requires ``impuls_spark`` + the model stack
  installed on executors — the normal cluster deployment;
- a ``Callable[[pd.Series], Sequence[np.ndarray]]``: YOUR encoder.
  It receives at most ``batch_rows`` texts per call (never more — the
  operator re-chunks Arrow batches), must return one float32 vector
  per input row, and runs ON THE EXECUTORS — so it must be picklable
  and lazily initialize any model handle (load the model inside the
  callable or via a module-level cache, not on the driver). This is
  where a sentence-transformers / torch call plugs in::

      _MODEL = None
      def st_encode(texts: pd.Series):
          global _MODEL            # one model per executor worker
          if _MODEL is None:
              from sentence_transformers import SentenceTransformer
              _MODEL = SentenceTransformer("all-MiniLM-L6-v2")
          return list(_MODEL.encode(list(texts), convert_to_numpy=True))

      emb = embed_texts(docs, encoder=st_encode, batch_rows=256)

  GPU sizing note: ``batch_rows`` is the ONLY knob bounding encoder
  activation memory; pick it for the model, not the data (a 100 TB
  corpus and a 1 GB corpus use the same value).
"""

from __future__ import annotations

from collections.abc import Callable, Iterator

import pandas as pd
from pyspark.sql import DataFrame

#: per-executor-worker model handles, keyed by model name — loading a
#: sentence-transformers model is seconds of work; one handle serves
#: every task the worker runs
_WORKER_MODELS: dict = {}


def _real_st_encode(texts: pd.Series, model_name: str) -> list:
    """Encode with the public ``sentence-transformers`` package (import
    guarded): runs on executors, lazily initializes one model handle
    per worker, returns one L2-normalized float32 vector per text."""
    import numpy as np

    model = _WORKER_MODELS.get(model_name)
    if model is None:
        try:
            from sentence_transformers import SentenceTransformer
        except ImportError as e:
            raise ImportError(
                "encoder='real' uses the public sentence-transformers "
                "package, which is not installed in this runtime "
                "(pip install sentence-transformers), or pass a callable "
                "encoder to plug in another model stack"
            ) from e
        model = SentenceTransformer(model_name)
        _WORKER_MODELS[model_name] = model
    vecs = model.encode(list(texts), convert_to_numpy=True)
    out = []
    for v in np.asarray(vecs, dtype=np.float32):
        norm = float(np.linalg.norm(v))
        out.append(v / norm if norm > 0 else v)
    return out


def embed_texts(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    dim: int = 64,
    encoder: "str | Callable[[pd.Series], list]" = "fake",
    batch_rows: int = 1024,
    model_name: str = "all-MiniLM-L6-v2",
) -> DataFrame:
    """(id, embedding array<float>) — one L2-normalized embedding per
    document. Output plugs directly into the ANN operators
    (:mod:`impuls_spark.llm.similarity`). See the module docstring for
    the pluggable-``encoder`` contract."""
    if not callable(encoder) and encoder not in ("fake", "real"):
        raise ValueError(
            f"encoder must be 'fake', 'real' or a callable, got {encoder!r}"
        )
    out_schema = f"{id_col} long, embedding array<float>"

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib

        import numpy as np

        def encode(texts: pd.Series) -> list:
            if callable(encoder):
                vecs = encoder(texts)
                if len(vecs) != len(texts):
                    raise ValueError(
                        f"encoder returned {len(vecs)} vectors for "
                        f"{len(texts)} texts"
                    )
                return [np.asarray(v, dtype=np.float32) for v in vecs]
            if encoder == "real":
                # import-guarded public-package path; the model decides
                # the output width, so ``dim`` must AGREE with it —
                # silently ignoring it would hand downstream ANN
                # operators mismatched vector widths (ADVICE r6)
                vecs = _real_st_encode(texts, model_name)
                if vecs and len(vecs[0]) != dim:
                    raise ValueError(
                        f"encoder='real' model {model_name!r} emits "
                        f"{len(vecs[0])}-wide vectors but dim={dim} was "
                        f"requested; pass dim={len(vecs[0])} so downstream "
                        "operators see the true width"
                    )
                return vecs
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
