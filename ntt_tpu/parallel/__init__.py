from .dist_ntt import (dist_intt, dist_lde, dist_ntt, exchange_options,
                       make_dist_ntt, make_mesh, shard_for_ntt, unshard)

__all__ = ["make_mesh", "make_dist_ntt", "dist_ntt", "dist_intt",
           "dist_lde", "exchange_options", "shard_for_ntt", "unshard"]
