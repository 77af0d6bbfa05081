from studiogan_tpu.analysis.analyses import (  # noqa: F401
    run_k_nearest_neighbor,
    run_linear_interpolation,
    run_frequency_analysis,
    run_tsne,
    calculate_intra_class_fid,
    run_semantic_factorization,
)
