from videos_to_tfrecords_spark.operators.filenames import (  # noqa: F401
    create_filenames,
    extract_label,
    filter_extensions,
)
from videos_to_tfrecords_spark.operators.split import (  # noqa: F401
    hash_bucket_split,
    randomly_split,
)
from videos_to_tfrecords_spark.operators.shuffle import shuffle  # noqa: F401
from videos_to_tfrecords_spark.operators.sequence import (  # noqa: F401
    crop_video,
    format_features,
    single_frame,
    to_full_video,
)
