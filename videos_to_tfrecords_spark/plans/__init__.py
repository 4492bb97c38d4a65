from videos_to_tfrecords_spark.plans.registry import ORACLES, QUERIES, query  # noqa: F401
