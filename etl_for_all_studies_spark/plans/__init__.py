from .correlation import compute_gene_pair_correlations

__all__ = ["compute_gene_pair_correlations"]
