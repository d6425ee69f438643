from .outliers import cell_grid_stats, exact_outliers, mr_approx_outliers

__all__ = ["cell_grid_stats", "exact_outliers", "mr_approx_outliers"]
