from .gtfs_read import load_gtfs
from .gtfs_write import save_gtfs
from .corpus import (compact_shards, read_corpus, read_training_shards,
                     remove_from_corpus, remove_from_shards, write_corpus,
                     write_training_shards)
from .jsonl import read_jsonl, write_jsonl
from .snapshot import load_feed_parquet, save_feed_parquet

__all__ = ["load_gtfs", "save_gtfs", "load_feed_parquet", "save_feed_parquet",
           "read_jsonl", "write_jsonl", "read_corpus", "write_corpus",
           "read_training_shards", "write_training_shards",
           "remove_from_shards", "remove_from_corpus", "compact_shards"]
