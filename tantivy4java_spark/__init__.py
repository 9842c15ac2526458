"""tantivy4java_spark — a from-scratch PySpark-native inverted-index + BM25 engine.

Re-expresses the capabilities of the reference (indextables/tantivy4java, a
JNI binding over the Rust Tantivy library + Quickwit split format) as an
idiomatic Spark pipeline:

- tokenization via vectorized pandas UDFs / built-in SQL expressions
  (reference contract: native/src/text_analyzer.rs:208-244)
- per-partition segment posting lists, delta-gap + varint compressed blocks
  with skip metadata (block-max scores for WAND-style pruning)
- hierarchical merge of segments into a global index stored as Parquet tables
- BM25 top-k (k1=1.2, b=0.75, tantivy-quantized fieldnorms) with term /
  boolean / phrase / fuzzy / regex / wildcard / range / field-scoped queries
- per-partition lineage manifest (txlog analog: native/src/txlog/actions.rs)
  enabling checkpoint/resume

Nothing here is a port: all reference citations are for *behavioral parity*,
the execution strategy is DataFrame/Catalyst throughout.
"""

from tantivy4java_spark.schema import FieldConfig, IndexConfig
from tantivy4java_spark.build import IndexBuilder, build_index
from tantivy4java_spark.searcher import IndexSearcher

__version__ = "0.2.0"  # 0.2: positions rows carry norm_id

__all__ = [
    "FieldConfig",
    "IndexConfig",
    "IndexBuilder",
    "build_index",
    "IndexSearcher",
]
