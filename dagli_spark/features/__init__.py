"""Heavy payload featurizers (Arrow-batched pandas UDF stages)."""
