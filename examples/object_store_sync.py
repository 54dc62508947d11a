"""Deployment recipe: external store → landing prefix → streaming ETL.

The reference's end-to-end flow is "poll a Drive folder, download new
reports, transform, upsert" (ref main.py:414-470). On Spark that
splits into two independently-scalable jobs:

1. a SYNC job (this file, or any bulk tool) moving bytes from the
   store the data is born in onto the landing prefix the cluster
   reads — runs on a schedule, tiny, driver-only;
2. the STREAMING ETL (streaming/pipeline.py) discovering landed files
   via the checkpointed file source, transforming with the POS kernel
   and merging into the fact table exactly-once.

Which sync mechanism to use:
- data born IN object storage (producers write s3://…/landing/
  directly): no sync job at all — point the pipeline at the prefix;
- bulk backfills: an rclone/distcp-class tool, then the same prefix;
- API-only sources (the reference's Drive case): implement the
  two-method Fetcher below against the vendor SDK and schedule
  sync_to_landing.

Run:  python examples/object_store_sync.py
"""

from __future__ import annotations

import os
import sys
import tempfile

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from amante_s_supabase_full_cloud_etl_pipeline_spark.sources.object_sync import (  # noqa: E402
    LocalDirFetcher,
    sync_to_landing,
)


def main() -> None:
    base = tempfile.mkdtemp(prefix="objsync-demo-")
    remote = os.path.join(base, "remote")  # stands in for Drive/S3
    landing = os.path.join(base, "landing")
    os.makedirs(remote)

    # day 1: two report drops appear in the remote store
    for name in ("report_0501.csv", "report_0502.csv"):
        with open(os.path.join(remote, name), "w") as f:
            f.write("Order ID,Products\nORD1,1 Latte\n")

    landed = sync_to_landing(LocalDirFetcher(remote), landing)
    print("pass 1 landed:", landed)

    # the scheduler fires again with nothing new: idempotent no-op
    print("pass 2 landed:", sync_to_landing(LocalDirFetcher(remote), landing))

    # day 2: one more drop → only the new file moves
    with open(os.path.join(remote, "report_0503.csv"), "w") as f:
        f.write("Order ID,Products\nORD2,2 Mocha\n")
    print("pass 3 landed:", sync_to_landing(LocalDirFetcher(remote), landing))

    print("landing dir:", sorted(os.listdir(landing)))
    # from here: streaming/pipeline.py pos_streaming_etl(landing, ...)
    # discovers these exactly-once and archives consumed files (S9).


if __name__ == "__main__":
    main()
