from .dist_ntt import (dist_intt, dist_lde, dist_ntt, make_dist_ntt,
                       make_mesh, shard_for_ntt, unshard)

__all__ = ["make_mesh", "make_dist_ntt", "dist_ntt", "dist_intt",
           "dist_lde", "shard_for_ntt", "unshard"]
