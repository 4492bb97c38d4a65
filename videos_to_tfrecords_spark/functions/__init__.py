from videos_to_tfrecords_spark.functions.hashing import h15, md5_hex  # noqa: F401
from videos_to_tfrecords_spark.functions.textfn import shingles, tokens  # noqa: F401
from videos_to_tfrecords_spark.functions.vector import cosine, dot, scaled_int_dot  # noqa: F401
