from .geometry import cell_ids, dist_sq, neighbor_offsets

__all__ = ["cell_ids", "dist_sq", "neighbor_offsets"]
