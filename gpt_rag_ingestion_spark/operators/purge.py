"""Anti-entropy purge operators (SURVEY.md J3-J6, §3.4).

All three reference purgers are the same shape: scan index → parse
identity → anti-join against the live source → delete
(reference jobs/blob_storage_indexer.py:1588-1671,
jobs/sharepoint_purger.py:416-520, jobs/nl2sql_purger.py:104-180,
jobs/multimodal_images_purger.py:55-113).

In Spark each is one ``left_anti`` join.  The live side (listing of
source objects) is usually much smaller than the chunks table, so
Catalyst/AQE picks broadcast automatically; we don't force it because
at 100 TB a source listing of a billion blobs should shuffle-hash-join
instead — exactly the call AQE makes at runtime.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def purge_targets(index_side: DataFrame, live_side: DataFrame, key: str) -> DataFrame:
    """J3/J4/J5: index rows whose ``key`` no longer exists in the live
    source."""
    return index_side.join(live_side.select(key).distinct(), on=key, how="left_anti")


def purge_orphan_images(
    image_listing: DataFrame, chunks: DataFrame, url_col: str = "url"
) -> DataFrame:
    """J6: images in the listing not referenced by any chunk's
    relatedImages (reference multimodal_images_purger.py:55-113)."""
    referenced = (
        chunks.select(F.explode_outer("relatedImages").alias(url_col))
        .filter(F.col(url_col).isNotNull())
        .distinct()
    )
    return image_listing.join(referenced, on=url_col, how="left_anti")
