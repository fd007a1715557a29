from .mapper import Chain, ChainAnchor, Mapper  # noqa: F401
