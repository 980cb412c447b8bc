"""Model zoo: ESANet family (static / skip-gate / local-gate / one-modality)
and modality-level DynMM networks (MM-IMDB, CMU-MOSEI)."""
