"""Lake-to-lake medallion hop driven by the change-data-feed.

This is the reference's core topology — a downstream processor tailing
an upstream table's Delta CDF (``silver/cdf_processor.py:255-275`` in
/root/reference reads ``readChangeFeed`` + startingVersion and applies
to the next layer) — expressed over the engine's own tables: a
:class:`FeedRelay` tails any upstream :class:`LakeTable` with
:class:`ChangeFeedTail`, re-shapes each polled range into an apply-able
batch, and drives a downstream :class:`MedallionPipeline` epoch with it.

Exactly-once across crashes composes from the two primitives it reuses:
the feed offset is acknowledged only AFTER the downstream epoch commits,
so a crash between apply and ack redelivers the same version range —
and the downstream epoch guard (keyed on the upstream commit version)
makes the redelivered apply a no-op. No coordination state beyond the
offset file and the downstream table's own epoch map.

Scale: each cycle moves O(changed rows since last ack) — the feed read
is O(commit footprint) per upstream commit and the downstream apply is
the pipeline's normal incremental path. A chain of medallion hops
(bronze lake -> silver lake -> export lake) therefore costs change
volume, not table volume, end to end.
"""

from __future__ import annotations

import os
import time

from maritime_activity_reports_cdc_spark.operators.changefeed import (
    ChangeFeedTail,
    changes_to_batch,
)
from maritime_activity_reports_cdc_spark.operators.apply import (
    DEFAULT_KEYS,
    DEFAULT_ORDER,
)
from maritime_activity_reports_cdc_spark.plans.pipeline import MedallionPipeline
from maritime_activity_reports_cdc_spark.sources.lake import LakeTable


class FeedRelay:
    """Tail an upstream table's change feed into a downstream pipeline."""

    def __init__(
        self,
        upstream: LakeTable,
        downstream: MedallionPipeline,
        checkpoint_dir: str,
        keys: tuple[str, ...] = DEFAULT_KEYS,
        order: tuple[str, ...] = DEFAULT_ORDER,
    ):
        os.makedirs(checkpoint_dir, exist_ok=True)
        self.tail = ChangeFeedTail(
            upstream,
            os.path.join(checkpoint_dir, "feed_offsets.json"),
            keys=keys,
            order=order,
        )
        self.downstream = downstream

    def run_once(self) -> dict | None:
        """One poll -> apply -> ack cycle; ``None`` when caught up.

        The downstream epoch id IS the upstream commit version, so a
        redelivered range (crash between apply and ack) no-ops through
        the downstream epoch guard before being acknowledged."""
        polled = self.tail.poll()
        if polled is None:
            return None
        changes, upto = polled
        batch = changes_to_batch(changes)
        metrics = self.downstream.apply_epoch(batch, epoch=upto)
        self.tail.ack(upto)
        return {
            "upto_version": upto,
            "n_events": metrics.n_events,
            "total_secs": metrics.total_secs,
        }

    def run(
        self,
        poll_secs: float = 2.0,
        max_polls: int | None = None,
        max_idle_polls: int = 3,
        finalize: bool = True,
    ) -> dict:
        """Bounded tail loop (the CLI/stream-manager cadence shape):
        polls until ``max_idle_polls`` consecutive empty polls (the
        upstream went quiet) or ``max_polls`` cycles, then finalizes the
        downstream (drains the async flush + derived refresh)."""
        cycles, idle, applied = 0, 0, 0
        while (max_polls is None or cycles < max_polls) and idle < max_idle_polls:
            out = self.run_once()
            cycles += 1
            if out is None:
                idle += 1
                if idle < max_idle_polls:
                    time.sleep(poll_secs)
            else:
                idle = 0
                applied += 1
        if finalize:
            self.downstream.finalize()
        return {"cycles": cycles, "ranges_applied": applied}
