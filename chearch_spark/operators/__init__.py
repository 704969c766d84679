"""chearch_spark — PySpark-native inverted-index + BM25 engine."""
