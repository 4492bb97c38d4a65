from videos_to_tfrecords_spark.operators.dedup import (  # noqa: F401
    connected_components,
    exact_dedup,
    minhash_lsh_dedup_pairs,
    ngram_jaccard_pairs,
    simhash,
)
from videos_to_tfrecords_spark.operators.filenames import (  # noqa: F401
    create_filenames,
    extract_label,
    filter_extensions,
)
from videos_to_tfrecords_spark.operators.multimodal import (  # noqa: F401
    decode_media_frames,
    with_media_payload,
)
from videos_to_tfrecords_spark.operators.relational import (  # noqa: F401
    asof_join,
    merge_upsert,
    salted_join,
    salted_sum,
    sessionize,
)
from videos_to_tfrecords_spark.operators.sampling import sample_frames_exact  # noqa: F401
from videos_to_tfrecords_spark.operators.sequence import (  # noqa: F401
    crop_video,
    format_features,
    single_frame,
    to_full_video,
)
from videos_to_tfrecords_spark.operators.shuffle import shuffle  # noqa: F401
from videos_to_tfrecords_spark.operators.similarity import (  # noqa: F401
    brute_force_topk,
    cosine_threshold_pairs,
    ivf_topk,
    lsh_topk,
)
from videos_to_tfrecords_spark.operators.split import (  # noqa: F401
    hash_bucket_split,
    randomly_split,
)
from videos_to_tfrecords_spark.operators.text import (  # noqa: F401
    with_fingerprint,
    with_lang_id,
    with_quality_score,
    with_token_stats,
)
