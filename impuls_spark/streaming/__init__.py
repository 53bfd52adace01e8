from .dedup import (dedup_stream, dedup_stream_vs_corpus,
                    dedup_stream_within_watermark)
from .enrich import enriched_window_stats
from .joins import interval_join
from .compact import (compact_corpus, compact_flat_dir,
                      last_committed_epoch)
from .metrics import (
    attach_progress_log,
    detach_progress_log,
    read_progress_log,
)
from .ann_ingest import (absorb_stream, ingest_vectors, stream_epochs,
                         takedown_stream_vectors)
from .ingest import (ingest_with_dedup, restore_stream_index_layout,
                     takedown_stream_corpus)
from .sinks import make_corpus_batch_writer, stream_to_corpus
from .sketch_sink import (
    make_kmv_batch_writer,
    read_kmv_partials,
    stream_kmv_partials,
)
from .sessions import sessionize_stream, windowed_event_counts
from .stateful import running_threshold_alerts
from .quota import stream_quota

__all__ = ["sessionize_stream", "windowed_event_counts",
           "running_threshold_alerts", "dedup_stream",
           "dedup_stream_within_watermark", "enriched_window_stats",
           "interval_join", "stream_to_corpus", "make_corpus_batch_writer", "ingest_with_dedup", "dedup_stream_vs_corpus",
           "stream_quota", "compact_corpus", "compact_flat_dir", "last_committed_epoch",
           "takedown_stream_corpus", "restore_stream_index_layout",
           "ingest_vectors", "absorb_stream", "stream_epochs",
           "takedown_stream_vectors",
           "attach_progress_log", "detach_progress_log",
           "read_progress_log", "make_kmv_batch_writer",
           "read_kmv_partials", "stream_kmv_partials"]
