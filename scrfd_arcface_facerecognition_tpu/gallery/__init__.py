"""TPU-resident embedding gallery: the vector-store layer.

Replaces the reference's Qdrant wrapper (/root/reference/qdrant_manager.py)
with an HBM-resident [capacity, 512] matrix: k-NN search is one MXU matmul
+ top-k, duplicate detection is a G x G cosine matmul (SURVEY.md §2.2),
and persistence is an explicit snapshot (the checkpoint/resume subsystem
the reference lacks, SURVEY.md §5).
"""

from .store import GalleryStore, SearchHit
from .dedup import (all_pairs_similarity, find_duplicate_pairs,
                    find_duplicate_pairs_blocked, duplicate_groups)
from .pq import PQCodec, PQGallery, adc_scores, sharded_pq_top_k
from .auto import AutoGallery

__all__ = ["GalleryStore", "SearchHit", "AutoGallery",
           "all_pairs_similarity", "find_duplicate_pairs",
           "find_duplicate_pairs_blocked", "duplicate_groups",
           "PQCodec", "PQGallery", "adc_scores", "sharded_pq_top_k"]
