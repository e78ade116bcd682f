"""Round-5 queries: evidence-age rotation companions.

New driver-checked queries added this round land here: reshaping
(melt / explode) and grouped-transform promotions, the hierarchical-IVF
multi-group probe, and trained-centroid IVF.
"""

from __future__ import annotations
