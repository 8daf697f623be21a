"""spark-submit entry points (north_rule: jobs submitted via
``spark-submit --py-files sketchlib.zip``)."""
