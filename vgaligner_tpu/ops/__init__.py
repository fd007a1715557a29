from .encode import encode_reads_host, window_kmer_codes  # noqa: F401
from .lookup import lookup_and_materialize_anchors  # noqa: F401
from .chain import chain_scores, make_gap_cost_table  # noqa: F401
