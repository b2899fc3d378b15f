from sparkts.operators.rollup import (  # noqa: F401
    TIERS,
    bucket_ts,
    rollup_base,
    rollup_cascade,
    build_tiers,
    apply_retention,
    crawl_activity,
    crawl_activity_checked,
)
from sparkts.operators.gapfill import calendar_spine, gap_fill  # noqa: F401
from sparkts.operators.features import (  # noqa: F401
    mstl_decomposition,
    split_frames,
)
from sparkts.operators.skew import (  # noqa: F401
    key_skew_profile,
    salted_rollup_base,
)
from sparkts.operators.multimodal import (  # noqa: F401
    attach_media_meta,
    decode_features,
    resize_images,
    sample_frames,
)
from sparkts.operators.similarity import (  # noqa: F401
    cosine_topk,
    embedding_near_dup_pairs,
    ivf_ann_topk,
    lsh_ann_topk,
    train_ivf_centroids,
)
from sparkts.operators.text import winnow_fingerprints  # noqa: F401
from sparkts.operators.dedup import (  # noqa: F401
    dedup_keep_flags,
    duplicate_clusters,
    exact_dedup,
    minhash_dedup_pairs,
    simhash_near_dup_pairs,
)
