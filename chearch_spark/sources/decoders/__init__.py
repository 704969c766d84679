"""Real media decoders pluggable into the multimodal seam
(:func:`chearch_spark.sources.multimodal.set_decoder`)."""
