"""vectrain_spark — a brand-new PySpark-native knowledge-graph construction
engine with the data-processing capabilities of torys877/vectrain,
re-expressed Spark-first.

The reference (read-only at /root/reference, studied not copied) is a Go
micro-service moving (id, text, payload) records through a three-stage
pipeline: batched source -> parallel embed map -> batched vector-store sink
(see internal/app/pipeline/pipeline.go:69-103). This package reinterprets
that ingest->embed->store dataflow as a web-scale KG pipeline:

    pages scan -> text extraction -> triple extraction -> entity linking
    (hash embeddings + LSH blocking + cosine top-k) -> canonicalization
    (connected components) -> materialize triples/edges with per-partition
    lineage and resumable checkpoints.

Everything is DataFrame/Catalyst-first; Python appears only inside
Arrow-batched pandas UDFs (never per-row Python), matching the
BASELINE.json input_hint.
"""

__version__ = "0.2.0"


def __getattr__(name):
    # lazy top-level conveniences: `from vectrain_spark import Catalog`
    # without paying pyspark-submodule import cost for tooling that only
    # wants __version__
    if name == "Catalog":
        from .catalog import Catalog

        return Catalog
    if name in ("PipelineConfig", "run_pipeline", "run_incremental"):
        from . import pipeline

        return getattr(pipeline, name)
    if name == "get_spark":
        from .session import get_spark

        return get_spark
    raise AttributeError(name)
