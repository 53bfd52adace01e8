"""App — CLI wrapper around a pipeline (parity: reference
impuls/app.py:116-145).

Subclass, implement :meth:`prepare`, call :meth:`run`:

    class MyCity(App):
        def prepare(self, args, options):
            return Pipeline([...], options=options)

    MyCity().run()

Exit codes mirror the reference: 0 success, 2 when inputs were
unchanged (``InputNotModified``, reference app.py:143-145).
"""

from __future__ import annotations

import argparse
import sys

from pyspark.sql import SparkSession

from .errors import InputNotModified
from .pipeline import Pipeline
from .task import PipelineOptions
from .tools.logs import initialize


class App:
    name: str = "impuls_spark"

    def add_arguments(self, parser: argparse.ArgumentParser) -> None:
        """Hook for subclass arguments."""

    def prepare(
        self, args: argparse.Namespace, options: PipelineOptions
    ) -> Pipeline:
        raise NotImplementedError

    def build_session(self, args: argparse.Namespace) -> SparkSession:
        return (
            SparkSession.builder.master(f"local[{args.cpus}]")
            .appName(self.name)
            .config("spark.sql.shuffle.partitions", str(args.cpus))
            .config("spark.sql.adaptive.enabled", "true")
            .config("spark.sql.session.timeZone", "UTC")
            .getOrCreate()
        )

    def run(self, argv: list[str] | None = None) -> int:
        parser = argparse.ArgumentParser(prog=self.name)
        parser.add_argument("-f", "--force-run", action="store_true",
                            help="run even if inputs are unchanged")
        parser.add_argument("-c", "--from-cache", action="store_true",
                            help="use cached inputs without fetching")
        parser.add_argument("-w", "--workspace", default="_impuls_workspace")
        parser.add_argument("-v", "--verbose", action="store_true")
        parser.add_argument("--cpus", type=int, default=4)
        self.add_arguments(parser)
        args = parser.parse_args(argv)

        initialize(args.verbose)
        options = PipelineOptions(
            force_run=args.force_run,
            from_cache=args.from_cache,
            workspace_directory=args.workspace,
        )
        spark = self.build_session(args)
        try:
            pipeline = self.prepare(args, options)
            pipeline.run(spark)
        except InputNotModified:
            print("inputs not modified — nothing to do", file=sys.stderr)
            return 2
        return 0
