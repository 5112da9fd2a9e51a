"""Background jobs & policies — the driver-side analog of the bgw scheduler.

Reference parity:
- Job catalog row (``sql/pre_install/tables.sql:222`` ``bgw_job``):
  ``add_job/delete_job/alter_job/run_job`` (``sql/job_api.sql:5-43``,
  ``src/bgw/job.c``).
- Scheduler semantics (``src/bgw/job_stat.c``):
  - success, drifting schedule: ``next_start = finish + schedule_interval``
    (``calculate_next_start_on_success_drifting``, job_stat.c:292)
  - success, fixed schedule: next slot on the grid anchored at
    ``initial_start`` (``calculate_next_start_on_success_fixed``,
    job_stat.c:282)
  - failure: ``next_start = finish + min(retry_period * min(consecutive_failures,
    MAX_FAILURES_MULTIPLIER=20), MAX_INTERVALS_BACKOFF=5 * schedule_interval)``
    (``calculate_next_start_on_failure``, job_stat.c:340; jitter omitted so
    tests are deterministic); for fixed schedules the retry never
    overshoots the next grid slot (job_stat.c:423).
- Policies (``sql/policy_api.sql``; ``tsl/src/bgw_policy/``): retention,
  compression/columnstore, continuous-aggregate refresh, reorder — each is
  just a ``bgw_job`` row whose ``proc`` names a builtin payload.

Spark-first notes: there is no background-worker process — a driver-side
``run_pending`` tick (or the ``run_loop`` convenience) plays the role of
``src/bgw/scheduler.c``. Job payloads operate on chunk *directories*
(retention = rmdir, compression = sorted rewrite), so a policy run is
O(chunks touched), never a row-level scan of the hypertable — the same
cost model as the reference and the property that matters at 100 TB.
"""

from __future__ import annotations

import time as _time
import traceback
from typing import Any, Callable, Optional, Union

from .functions.time import parse_interval

MAX_INTERVALS_BACKOFF = 5  # src/bgw/job_stat.c:25
MAX_FAILURES_MULTIPLIER = 20  # src/bgw/job_stat.c:26
DEFAULT_RETRY_PERIOD_S = 300.0  # 5 min, sql/job_api.sql defaults


def _epoch_seconds(v) -> float:
    """Absolute time spec (epoch seconds, ISO string, datetime) ->
    epoch seconds."""
    from datetime import datetime as _dt, timezone as _tzmod

    if isinstance(v, (int, float)) and not isinstance(v, bool):
        return float(v)
    if isinstance(v, str):
        v = _dt.fromisoformat(v)
    if isinstance(v, _dt):
        if v.tzinfo is None:
            v = v.replace(tzinfo=_tzmod.utc)
        return v.timestamp()
    raise ValueError(f"cannot interpret {v!r} as an absolute time")


def _seconds(interval: Union[str, int, float, None]) -> Optional[float]:
    """Schedule/offset spec -> wall-clock seconds."""
    if interval is None:
        return None
    if isinstance(interval, (int, float)) and not isinstance(interval, bool):
        return float(interval)
    iv = parse_interval(interval)
    if iv.months:
        # calendar months in a schedule: approximate as 30 days, like the
        # reference's interval arithmetic on TimestampTz addition would
        # resolve per-run; close enough for scheduling.
        return iv.months * 30 * 86400.0 + iv.us / 1e6
    return iv.us / 1e6


def _offset_internal(offset: Union[str, int, None], now_us: int) -> Optional[int]:
    """``now() - offset`` in internal µs; int offsets pass through the
    caller's integer timeline (handled by the payloads)."""
    if offset is None:
        return None
    if isinstance(offset, int) and not isinstance(offset, bool):
        return offset
    iv = parse_interval(offset)
    us = iv.us + iv.months * 30 * 86400 * 1_000_000
    return now_us - us


# --------------------------------------------------------------------------
# builtin policy payloads (tsl/src/bgw_policy/job.c dispatch table)
# --------------------------------------------------------------------------

def _ht_cutoff(ht, after: Union[str, int], now_s: float) -> int:
    """Cutoff in the hypertable's internal units for an ``*_after`` offset.

    Timestamp dims: ``now - after`` in µs. Integer dims: the reference
    requires an ``integer_now`` function; ours falls back to the max
    chunk ``range_end`` as "now" (covers the common backfill case).
    """
    if isinstance(after, (int, float)) and not isinstance(after, bool):
        fn = ht.ts.jobs._integer_now.get(ht.name)
        now_i = fn() if fn else max((c["range_end"] for c in ht.chunks()), default=0)
        return int(now_i - after)
    iv = parse_interval(after)
    us = iv.us + iv.months * 30 * 86400 * 1_000_000
    return int(now_s * 1_000_000) - us


def _proc_retention(ts, config: dict, now_s: float) -> dict:
    """``add_retention_policy`` payload (tsl/src/bgw_policy/retention_api.c):
    drop whole chunks older than the cutoff."""
    ht = ts.get_hypertable(config["hypertable"])
    cutoff = _ht_cutoff(ht, config["drop_after"], now_s)
    dropped = ht.drop_chunks(older_than=cutoff)
    return {"dropped_chunks": len(dropped)}


def _proc_compression(ts, config: dict, now_s: float) -> dict:
    """``add_compression_policy`` / ``add_columnstore_policy`` payload
    (tsl/src/bgw_policy/compression_api.c): compress rowstore chunks whose
    range is entirely older than the cutoff."""
    from .compression import compress_chunks

    ht = ts.get_hypertable(config["hypertable"])
    cutoff = _ht_cutoff(ht, config["compress_after"], now_s)
    done = compress_chunks(
        ht,
        older_than=cutoff,
        recompress_unordered=bool(config.get("recompress_unordered", True)),
    )
    return {"compressed_chunks": len(done)}


def _proc_refresh_cagg(ts, config: dict, now_s: float) -> dict:
    """``add_continuous_aggregate_policy`` payload
    (tsl/src/bgw_policy/continuous_aggregate_api.c): refresh the sliding
    window ``[now-start_offset, now-end_offset)``; NULL offset = open
    end. Integer offsets are OFFSETS on the integer timeline — subtract
    from the source's ``integer_now`` (reference requirement) so the
    window actually slides, instead of treating them as absolute times
    (which would pin a static — usually empty — window forever)."""
    cagg = ts.get_cagg(config["cagg"])
    start_off = config.get("start_offset")
    end_off = config.get("end_offset")
    src = ts.get_hypertable(cagg.row["hypertable_name"])
    if src.row.get("time_type") == "int":
        fn = ts.jobs._integer_now.get(src.name)
        now_i = (
            fn() if fn else max((c["range_end"] for c in src.chunks()), default=0)
        )
        start = None if start_off is None else int(now_i - start_off)
        end = None if end_off is None else int(now_i - end_off)
    else:
        now_us = int(now_s * 1_000_000)
        start = _offset_internal(start_off, now_us)
        end = _offset_internal(end_off, now_us)
    ranges = cagg.refresh(
        start=start,
        end=end,
        buckets_per_batch=int(config.get("buckets_per_batch") or 0),
        max_batches=int(config.get("max_batches_per_execution") or 0),
        refresh_newest_first=bool(
            config.get("refresh_newest_first") or False
        ),
    )
    return {"materialized_ranges": len(ranges)}


def _proc_reorder(ts, config: dict, now_s: float) -> dict:
    """``add_reorder_policy`` payload (tsl/src/bgw_policy/reorder_api.c):
    sorted rewrite of completed chunks not yet reordered, newest first,
    one chunk per run (the reference also does one chunk per job run)."""
    from .compression import reorder_chunk

    ht = ts.get_hypertable(config["hypertable"])
    meta = ts.catalog.table("metadata")
    done_key = f"reorder_done_{ht.id}"
    row = meta.find_one(key=done_key)
    done = set(row["value"]) if row else set()
    chunks = ht.chunks()
    newest = max((c["range_start"] for c in chunks), default=None)
    candidates = [
        c
        for c in chunks
        if c["range_start"] not in done
        and c.get("status") != "columnstore"
        # COMPLETED chunks only: the newest chunk is still receiving
        # inserts — reordering it would race the writes AND mark it
        # done, leaving every later row in it unsorted forever (the
        # reference reorders chunks the insert frontier has left)
        and c["range_start"] != newest
    ]
    if not candidates:
        return {"reordered": 0}
    chunk = max(candidates, key=lambda c: c["range_start"])
    reorder_chunk(ht, chunk, by=config["order_by"])
    done.add(chunk["range_start"])
    if row:
        meta.update({"key": done_key}, {"value": sorted(done)})
    else:
        meta.append([{"key": done_key, "value": sorted(done)}])
    return {"reordered": 1, "chunk": chunk["range_start"]}


def _proc_compaction(ts, config: dict, now_s: float) -> dict:
    """``add_compaction_policy`` payload
    (tsl/src/bgw_policy/compaction_api.c + job.c recompression dispatch):
    (re)compress chunks that are not in columnstore form — never-compressed
    completed chunks and chunks knocked back to rowstore by DML — oldest
    first, at most ``max_chunks`` per run, skipping chunks whose range
    isn't at least ``inactive_for`` old."""
    from .compression import recompress_chunk

    ht = ts.get_hypertable(config["hypertable"])
    cutoff = (
        _ht_cutoff(ht, config["inactive_for"], now_s)
        if config.get("inactive_for") is not None
        else None
    )
    cands = sorted(
        (
            c
            for c in ht.chunks()
            if c.get("status") != "columnstore"
            and (cutoff is None or c["range_end"] <= cutoff)
        ),
        key=lambda c: c["range_start"],
    )
    # max_chunks=0 means "unlimited" (matching the reference's
    # compaction_api.c default and policies stored before the bound was
    # enforced — a stored 0 must keep compacting, not silently stop)
    max_chunks = config.get("max_chunks")
    if max_chunks is not None and int(max_chunks) > 0:
        cands = cands[: int(max_chunks)]
    # max_batches bounds per-run work like the reference's
    # compaction_api.c: treat it as an additional per-run chunk budget
    # (parquet has no sub-chunk batch granularity to count)
    max_batches = config.get("max_batches")
    if max_batches is not None and int(max_batches) > 0:
        cands = cands[: int(max_batches)]
    for c in cands:
        recompress_chunk(ht, c)
    return {"compacted_chunks": len(cands)}


BUILTIN_PROCS: dict[str, Callable] = {
    "policy_retention": _proc_retention,
    "policy_compression": _proc_compression,
    "policy_columnstore": _proc_compression,
    "policy_refresh_continuous_aggregate": _proc_refresh_cagg,
    "policy_reorder": _proc_reorder,
    "policy_compaction": _proc_compaction,
}


class JobRegistry:
    """``ts.jobs`` — job catalog + driver-side scheduler tick."""

    def __init__(self, ts):
        self.ts = ts
        self._procs: dict[str, Callable] = {}
        self._integer_now: dict[str, Callable[[], int]] = {}

    # ------------------------------------------------------------- job api
    def add_job(
        self,
        proc: Union[str, Callable],
        schedule_interval: Union[str, int, float],
        config: Optional[dict] = None,
        initial_start: Optional[float] = None,
        fixed_schedule: bool = True,
        scheduled: bool = True,
        retry_period: Union[str, int, float] = DEFAULT_RETRY_PERIOD_S,
        job_name: Optional[str] = None,
    ) -> int:
        """``add_job(proc, schedule_interval, ...)`` (sql/job_api.sql:5).

        ``proc`` is a builtin payload name, a name previously passed to
        :meth:`register_proc`, or a callable (registered under its
        ``__name__``; note callables don't survive process restart — the
        catalog row does, and re-registering rebinds it).
        """
        if callable(proc):
            self.register_proc(proc.__name__, proc)
            proc = proc.__name__
        cat = self.ts.catalog
        job_id = cat.next_id("bgw_job")
        now = self.now()
        start = initial_start if initial_start is not None else now
        cat.bgw_job.append(
            [
                {
                    "id": job_id,
                    "application_name": job_name or f"{proc} [{job_id}]",
                    "proc": proc,
                    "schedule_interval": _seconds(schedule_interval),
                    "retry_period": _seconds(retry_period),
                    "fixed_schedule": bool(fixed_schedule),
                    "scheduled": bool(scheduled),
                    "initial_start": start,
                    "config": config or {},
                }
            ]
        )
        cat.bgw_job_stat.append(
            [
                {
                    "job_id": job_id,
                    "last_start": None,
                    "last_finish": None,
                    "next_start": start,
                    "last_run_success": None,
                    "total_runs": 0,
                    "total_successes": 0,
                    "total_failures": 0,
                    "consecutive_failures": 0,
                }
            ]
        )
        return job_id

    def delete_job(self, job_id: int) -> None:
        """``delete_job`` (sql/job_api.sql)."""
        n = self.ts.catalog.bgw_job.delete({"id": job_id})
        if not n:
            raise KeyError(f"no job {job_id}")
        self.ts.catalog.bgw_job_stat.delete({"job_id": job_id})

    def alter_job(self, job_id: int, **changes: Any) -> dict:
        """``alter_job`` (sql/job_api.sql:30): mutate schedule/config/
        scheduled/next_start in place.

        ``config_merge`` (sql/job_api.sql:36; tsl/src/bgw_policy/
        job_api.c:434, reference PR #10225) merges the given keys into
        the EXISTING config — merge keys take precedence, untouched
        keys survive — instead of replacing it wholesale like
        ``config``; specifying both is an error, like the reference."""
        cat = self.ts.catalog
        job = cat.bgw_job.find_one(id=job_id)
        if not job:
            raise KeyError(f"no job {job_id}")
        config_merge = changes.pop("config_merge", None)
        if config_merge is not None:
            if "config" in changes:
                raise ValueError(
                    'cannot specify both "config" and "config_merge": '
                    'use "config" to replace the configuration or '
                    '"config_merge" to merge into it'
                )
            merged = dict(job.get("config") or {})
            merged.update(config_merge)
            changes["config"] = merged
        next_start = changes.pop("next_start", None)
        for k in ("schedule_interval", "retry_period"):
            if k in changes:
                changes[k] = _seconds(changes[k])
        if changes:
            cat.bgw_job.update({"id": job_id}, changes)
        if next_start is not None:
            # normalize to epoch seconds — a raw timestamp string/datetime
            # stored here would TypeError against now() on every later
            # scheduler tick, stalling ALL jobs
            cat.bgw_job_stat.update(
                {"job_id": job_id},
                {"next_start": _epoch_seconds(next_start)},
            )
        return cat.bgw_job.find_one(id=job_id)

    def list(self) -> list[dict]:
        return sorted(self.ts.catalog.bgw_job.read(), key=lambda j: j["id"])

    def stats(self, job_id: Optional[int] = None) -> list[dict]:
        """``timescaledb_information.job_stats`` (sql/views.sql)."""
        rows = self.ts.catalog.bgw_job_stat.read()
        if job_id is not None:
            rows = [r for r in rows if r["job_id"] == job_id]
        return rows

    def history(self, job_id: Optional[int] = None) -> list[dict]:
        """``timescaledb_information.job_history`` (bgw_job_stat_history)."""
        rows = self.ts.catalog.bgw_job_stat_history.read()
        if job_id is not None:
            rows = [r for r in rows if r["job_id"] == job_id]
        return rows

    def register_proc(self, name: str, fn: Callable) -> None:
        """Bind a custom payload: ``fn(ts, config) -> Any``."""
        self._procs[name] = fn

    def set_integer_now(self, hypertable: str, fn: Callable[[], int]) -> None:
        """``set_integer_now_func`` analog for integer time dimensions."""
        self._integer_now[hypertable] = fn

    # ----------------------------------------------------------- scheduler
    def now(self) -> float:
        return _time.time()

    def run_job(self, job_id: int, now: Optional[float] = None) -> dict:
        """``run_job`` (sql/job_api.sql:43): execute immediately, record
        stats + history, compute the next start."""
        cat = self.ts.catalog
        job = cat.bgw_job.find_one(id=job_id)
        if not job:
            raise KeyError(f"no job {job_id}")
        start = now if now is not None else self.now()
        proc = self._procs.get(job["proc"]) or BUILTIN_PROCS.get(job["proc"])
        ok, result, err = True, None, None
        if proc is None:
            ok, err = False, f"unknown proc {job['proc']!r}"
        else:
            try:
                if proc in BUILTIN_PROCS.values():
                    result = proc(self.ts, job.get("config") or {}, start)
                else:
                    result = proc(self.ts, job.get("config") or {})
            except Exception as e:  # noqa: BLE001 — job isolation, like a bgw crash
                ok, err = False, f"{type(e).__name__}: {e}"
                traceback.print_exc()
        finish = now if now is not None else self.now()
        self._record_run(job, start, finish, ok, err)
        return {"job_id": job_id, "success": ok, "result": result, "error": err}

    def _record_run(
        self, job: dict, start: float, finish: float, ok: bool, err: Optional[str]
    ) -> None:
        cat = self.ts.catalog
        st = cat.bgw_job_stat.find_one(job_id=job["id"]) or {
            "job_id": job["id"],
            "total_runs": 0,
            "total_successes": 0,
            "total_failures": 0,
            "consecutive_failures": 0,
        }
        consecutive = 0 if ok else int(st.get("consecutive_failures") or 0) + 1
        changes = {
            "last_start": start,
            "last_finish": finish,
            "last_run_success": ok,
            "total_runs": int(st.get("total_runs") or 0) + 1,
            "total_successes": int(st.get("total_successes") or 0) + (1 if ok else 0),
            "total_failures": int(st.get("total_failures") or 0) + (0 if ok else 1),
            "consecutive_failures": consecutive,
            "next_start": self._next_start(job, finish, ok, consecutive),
        }
        if cat.bgw_job_stat.find_one(job_id=job["id"]):
            cat.bgw_job_stat.update({"job_id": job["id"]}, changes)
        else:
            cat.bgw_job_stat.append([{**st, **changes}])
        cat.bgw_job_stat_history.append(
            [
                {
                    "job_id": job["id"],
                    "proc": job["proc"],
                    "start": start,
                    "finish": finish,
                    "success": ok,
                    "error": err,
                }
            ]
        )

    def _next_start(
        self, job: dict, finish: float, ok: bool, consecutive_failures: int
    ) -> float:
        interval = float(job["schedule_interval"])
        if ok:
            if job.get("fixed_schedule"):
                # next slot on the grid anchored at initial_start
                # (calculate_next_start_on_success_fixed, job_stat.c:282);
                # `is None`, not truthiness — an epoch-0 anchor is valid
                ia = job.get("initial_start")
                anchor = float(finish if ia is None else ia)
                if finish < anchor:
                    return anchor
                k = int((finish - anchor) // interval) + 1
                return anchor + k * interval
            return finish + interval  # drifting (job_stat.c:292)
        # failure backoff (calculate_next_start_on_failure, job_stat.c:340);
        # `is None`, not truthiness — retry_period=0 means retry NOW
        rp = job.get("retry_period")
        retry = float(DEFAULT_RETRY_PERIOD_S if rp is None else rp)
        mult = min(consecutive_failures, MAX_FAILURES_MULTIPLIER)
        backoff = min(retry * mult, MAX_INTERVALS_BACKOFF * interval)
        nxt = finish + backoff
        if job.get("fixed_schedule"):
            # never overshoot the next scheduled slot (job_stat.c:423)
            nxt = min(nxt, self._next_start(job, finish, True, 0))
        return nxt

    def run_pending(self, now: Optional[float] = None) -> list[dict]:
        """One scheduler tick (src/bgw/scheduler.c loop body): run every
        scheduled job whose ``next_start`` has arrived."""
        now = now if now is not None else self.now()
        # restore mode (timescaledb_pre_restore, sql/restoring.sql): the
        # background scheduler idles until timescaledb_post_restore
        meta = self.ts.catalog.metadata.find_one(key="restoring")
        if meta and meta.get("value"):
            return []
        out = []
        for job in self.list():
            if not job.get("scheduled"):
                continue
            st = self.ts.catalog.bgw_job_stat.find_one(job_id=job["id"])
            nxt = st.get("next_start") if st else None
            if nxt is not None and nxt <= now:
                out.append(self.run_job(job["id"], now=now))
        return out

    def run_loop(self, poll_interval: float = 1.0, max_ticks: Optional[int] = None):
        """Blocking scheduler loop for long-running drivers."""
        ticks = 0
        while max_ticks is None or ticks < max_ticks:
            self.run_pending()
            ticks += 1
            _time.sleep(poll_interval)

    # ------------------------------------------------------------ policies
    def _add_policy(
        self,
        proc: str,
        config: dict,
        schedule_interval: Union[str, int, float],
        if_not_exists: bool = False,
    ) -> int:
        """A policy is identified by (proc, TARGET), not by its full
        config: re-adding the same policy with different parameters must
        error like the reference ('policy already exists'), not silently
        create a second competing job that remove_*_policy would miss."""
        target_keys = ("hypertable", "cagg")
        target = {k: config.get(k) for k in target_keys if k in config}
        for job in self.list():
            cfg = job.get("config") or {}
            if job["proc"] != proc:
                continue
            if {k: cfg.get(k) for k in target_keys if k in config} != target:
                continue
            if if_not_exists:
                return job["id"]
            raise ValueError(
                f"policy already exists as job {job['id']} "
                f"(remove it first to change parameters)"
            )
        return self.add_job(proc, schedule_interval, config=config)

    def add_retention_policy(
        self,
        hypertable: str,
        drop_after: Union[str, int],
        schedule_interval: Union[str, int, float] = "1 day",
        if_not_exists: bool = False,
    ) -> int:
        """``add_retention_policy`` (sql/policy_api.sql:13); default
        schedule 1 day matches the reference."""
        self.ts.get_hypertable(hypertable)  # validate
        return self._add_policy(
            "policy_retention",
            {"hypertable": hypertable, "drop_after": drop_after},
            schedule_interval,
            if_not_exists,
        )

    def add_compression_policy(
        self,
        hypertable: str,
        compress_after: Union[str, int],
        schedule_interval: Union[str, int, float] = "12 hours",
        if_not_exists: bool = False,
        recompress_unordered: bool = True,
    ) -> int:
        """``add_compression_policy`` / ``add_columnstore_policy``
        (sql/policy_api.sql:66,79). ``recompress_unordered``
        (sql/policy_internal.sql:141, reference PR #10226, default TRUE)
        controls whether the policy also recompresses columnstore chunks
        whose rowstore tail is unordered (post-compression appends)."""
        self.ts.get_hypertable(hypertable)
        return self._add_policy(
            "policy_compression",
            {
                "hypertable": hypertable,
                "compress_after": compress_after,
                "recompress_unordered": bool(recompress_unordered),
            },
            schedule_interval,
            if_not_exists,
        )

    add_columnstore_policy = add_compression_policy

    def add_continuous_aggregate_policy(
        self,
        cagg: str,
        start_offset: Union[str, int, None],
        end_offset: Union[str, int, None],
        schedule_interval: Union[str, int, float],
        if_not_exists: bool = False,
        buckets_per_batch: Optional[int] = None,
        max_batches_per_execution: Optional[int] = None,
        refresh_newest_first: Optional[bool] = None,
    ) -> int:
        """``add_continuous_aggregate_policy`` (sql/policy_api.sql:99;
        the three incremental-refresh columns are the reference 2.18
        batching knobs, passed through to ``Cagg.refresh``)."""
        self.ts.get_cagg(cagg)
        conf = {
            "cagg": cagg,
            "start_offset": start_offset,
            "end_offset": end_offset,
        }
        if buckets_per_batch is not None:
            conf["buckets_per_batch"] = int(buckets_per_batch)
        if max_batches_per_execution is not None:
            conf["max_batches_per_execution"] = int(
                max_batches_per_execution
            )
        if refresh_newest_first is not None:
            conf["refresh_newest_first"] = bool(refresh_newest_first)
        return self._add_policy(
            "policy_refresh_continuous_aggregate",
            conf,
            schedule_interval,
            if_not_exists,
        )

    def add_reorder_policy(
        self,
        hypertable: str,
        order_by: list,
        schedule_interval: Union[str, int, float] = "1 day",
        if_not_exists: bool = False,
    ) -> int:
        """``add_reorder_policy`` (sql/policy_api.sql:33)."""
        self.ts.get_hypertable(hypertable)
        return self._add_policy(
            "policy_reorder",
            {"hypertable": hypertable, "order_by": list(order_by)},
            schedule_interval,
            if_not_exists,
        )

    def add_compaction_policy(
        self,
        hypertable: str,
        schedule_interval: Union[str, int, float] = "1 day",
        if_not_exists: bool = False,
        max_chunks: Optional[int] = None,
        max_batches: Optional[int] = None,
        inactive_for: Union[str, int, None] = None,
    ) -> int:
        """``add_compaction_policy`` (sql/policy_api.sql:48;
        tsl/src/bgw_policy/compaction_api.c): periodic (re)compression of
        chunks not in columnstore form. Requires columnstore settings on
        the hypertable, like the reference (compaction_api.c:153)."""
        ht = self.ts.get_hypertable(hypertable)
        if not self.ts.catalog.compression_settings.find_one(hypertable_id=ht.id):
            raise ValueError(
                f"compaction policy requires compression to be enabled on "
                f"hypertable {hypertable!r} (compaction_api.c:153)"
            )
        for val, name in ((max_chunks, "max_chunks"), (max_batches, "max_batches")):
            if val is not None and val < 0:
                raise ValueError(f"{name} must be greater than or equal to 0")
        return self._add_policy(
            "policy_compaction",
            {
                "hypertable": hypertable,
                "max_chunks": max_chunks,
                "max_batches": max_batches,
                "inactive_for": inactive_for,
            },
            schedule_interval,
            if_not_exists,
        )

    # ---- timescaledb_experimental.policies_v2 (sql/policy_api.sql:129-168)
    def add_policies(
        self,
        relation: str,
        if_not_exists: bool = False,
        refresh_start_offset: Union[str, int, None] = None,
        refresh_end_offset: Union[str, int, None] = None,
        compress_after: Union[str, int, None] = None,
        drop_after: Union[str, int, None] = None,
        refresh_schedule_interval: Union[str, int, float] = "1 hour",
    ) -> bool:
        """One-step cagg policies (``timescaledb_experimental.add_policies``,
        tsl/src/bgw_policy/policies_v2.c): the refresh policy targets the
        cagg; compression and retention target its materialization
        hypertable (policies_v2.c:316,436)."""
        cagg = self.ts.get_cagg(relation)
        mat = cagg.row["mat_table"]
        added = False
        if refresh_start_offset is not None or refresh_end_offset is not None:
            self.add_continuous_aggregate_policy(
                relation,
                refresh_start_offset,
                refresh_end_offset,
                schedule_interval=refresh_schedule_interval,
                if_not_exists=if_not_exists,
            )
            added = True
        if compress_after is not None:
            from .compression import enable_columnstore

            mat_ht = self.ts.get_hypertable(mat)
            if not self.ts.catalog.compression_settings.find_one(
                hypertable_id=mat_ht.id
            ):
                # the reference requires/sets compression on the mat
                # hypertable; order by the bucket column by default
                enable_columnstore(mat_ht, orderby=[cagg.row["bucket_alias"]])
            self.add_compression_policy(
                mat, compress_after, if_not_exists=if_not_exists
            )
            added = True
        if drop_after is not None:
            self.add_retention_policy(mat, drop_after, if_not_exists=if_not_exists)
            added = True
        return added

    def alter_policies(
        self,
        relation: str,
        if_exists: bool = False,
        refresh_start_offset: Union[str, int, None] = None,
        refresh_end_offset: Union[str, int, None] = None,
        compress_after: Union[str, int, None] = None,
        drop_after: Union[str, int, None] = None,
    ) -> bool:
        """``timescaledb_experimental.alter_policies``
        (tsl/src/bgw_policy/policies_v2.c): update the offsets of the
        cagg's EXISTING v2 policies in place. A missing policy errors
        unless ``if_exists`` (the reference's if_exists semantics)."""
        by_proc: dict = {}
        for j in self._v2_jobs(relation):
            by_proc.setdefault(j["proc"], j)
        changed = False

        def _upd(proc: str, updates: dict) -> None:
            nonlocal changed
            j = by_proc.get(proc)
            if j is None:
                if if_exists:
                    return
                raise ValueError(
                    f"no {proc} policy on {relation!r} "
                    f"(alter_policies alters existing policies; use "
                    f"add_policies to create them)"
                )
            cfg = dict(j.get("config") or {})
            cfg.update(updates)
            self.alter_job(j["id"], config=cfg)
            changed = True

        if refresh_start_offset is not None or refresh_end_offset is not None:
            upd = {}
            if refresh_start_offset is not None:
                upd["start_offset"] = refresh_start_offset
            if refresh_end_offset is not None:
                upd["end_offset"] = refresh_end_offset
            _upd("policy_refresh_continuous_aggregate", upd)
        if compress_after is not None:
            _upd("policy_compression", {"compress_after": compress_after})
        if drop_after is not None:
            _upd("policy_retention", {"drop_after": drop_after})
        return changed

    _V2_PROCS = {
        "policy_refresh_continuous_aggregate": "cagg",
        "policy_compression": "hypertable",
        "policy_retention": "hypertable",
    }

    def _v2_jobs(self, relation: str) -> list[dict]:
        cagg = self.ts.get_cagg(relation)
        mat = cagg.row["mat_table"]
        out = []
        for job in self.list():
            key = self._V2_PROCS.get(job["proc"])
            if key is None:
                continue
            target = (job.get("config") or {}).get(key)
            if (key == "cagg" and target == relation) or (
                key == "hypertable" and target == mat
            ):
                out.append(job)
        return out

    def remove_policies(
        self, relation: str, if_exists: bool = False, *policy_names: str
    ) -> bool:
        """``timescaledb_experimental.remove_policies`` (policy_api.sql:137)."""
        jobs = {j["proc"]: j for j in self._v2_jobs(relation)}
        ok = True
        for name in policy_names:
            job = jobs.get(name)
            if job is None:
                if not if_exists:
                    raise KeyError(f"no policy {name!r} on {relation!r}")
                ok = False
                continue
            self.delete_job(job["id"])
        return ok

    def remove_all_policies(self, relation: str, if_exists: bool = False) -> bool:
        """``timescaledb_experimental.remove_all_policies`` (policy_api.sql:146)."""
        jobs = self._v2_jobs(relation)
        if not jobs and not if_exists:
            raise KeyError(f"no policies on {relation!r}")
        for job in jobs:
            self.delete_job(job["id"])
        return bool(jobs)

    def show_policies(self, relation: str) -> list[dict]:
        """``timescaledb_experimental.show_policies`` (policy_api.sql:164)."""
        return [
            {"policy_name": j["proc"], **(j.get("config") or {})}
            for j in self._v2_jobs(relation)
        ]

    def remove_compaction_policy(self, hypertable: str) -> None:
        self._remove_policy("policy_compaction", "hypertable", hypertable)

    def _remove_policy(self, proc: str, match_key: str, match_val: str) -> None:
        for job in self.list():
            if job["proc"] == proc and (job.get("config") or {}).get(match_key) == match_val:
                self.delete_job(job["id"])
                return
        raise KeyError(f"no {proc} policy for {match_val!r}")

    def remove_retention_policy(self, hypertable: str) -> None:
        self._remove_policy("policy_retention", "hypertable", hypertable)

    def remove_compression_policy(self, hypertable: str) -> None:
        self._remove_policy("policy_compression", "hypertable", hypertable)

    remove_columnstore_policy = remove_compression_policy

    def remove_continuous_aggregate_policy(self, cagg: str) -> None:
        self._remove_policy("policy_refresh_continuous_aggregate", "cagg", cagg)

    def remove_reorder_policy(self, hypertable: str) -> None:
        self._remove_policy("policy_reorder", "hypertable", hypertable)
