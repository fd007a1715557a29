from .kmer_gen import GraphKmer, generate_kmers, generate_pos_on_ref  # noqa: F401
from .build import Index  # noqa: F401
