"""serenedb_spark — a PySpark-native search+analytics engine.

Re-expresses the capabilities of serenedb/serenedb (see SURVEY.md) on the
Spark DataFrame/SQL stack: inverted indexes as postings DataFrames, TSQUERY
predicates as plan rewrites, scoring as expression pipelines, plus
large-scale data-pipeline operators (dedup, ANN, text analysis).
"""

from serenedb_spark.session import SereneSession, get_spark
from serenedb_spark.operators.indexing import InvertedIndex, build_index, save_index, load_index
from serenedb_spark.plans.tsquery import (
    Term, AnyOf, AllOf, Phrase, Prefix, Wildcard, Regexp, Fuzzy, Between,
    NgramSim, And, Or, Not, Boost, Compound, to_tsquery,
)

__all__ = [
    "SereneSession", "get_spark", "InvertedIndex", "build_index",
    "save_index", "load_index", "Term", "AnyOf", "AllOf", "Phrase",
    "Prefix", "Wildcard", "Regexp", "Fuzzy", "Between", "NgramSim",
    "And", "Or", "Not", "Boost", "Compound", "to_tsquery",
]
