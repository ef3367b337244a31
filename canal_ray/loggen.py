"""Deterministic synthetic binlog fixture generator (seeded, streaming).

Produces the engine's only inputs (FIXTURES.md §1-2):

  <out_dir>/base/repos.parquet            initial snapshot of the source table
  <out_dir>/binlog/segment_00000.parquet  ordered change-event segments
  <out_dir>/fixture_meta.json             generation parameters

The event-log schema mirrors Canal's Entry/Header/RowChange/Column model
(``/root/reference/protocol/src/main/java/com/alibaba/otter/canal/protocol/
EntryProtocol.proto:12-153``) flattened into one stable Arrow schema. Column
values are transported as **strings** in parallel ``cols``/``vals`` list
columns — exactly Canal's stringly ``Column.value`` contract
(``EntryProtocol.proto:76-109``); typed materialization happens at apply time
against the DDL-evolved schema registry. Keeping the log schema fixed while
the *payload* column set evolves lets every segment share one Parquet schema
(Canal likewise never changes its wire protocol when tables evolve).

Rows carry full after-images (binlog_format=ROW, binlog_row_image=FULL — the
mode Canal requires, ``parse/.../AbstractMysqlEventParser.java:149-168``), so
UPDATE == whole-row replace. DELETE carries only the PK (the pre-image is
redundant given FULL images; a space optimization, noted vs
``EntryProtocol.proto:111-121``).

Generation is vectorized per segment and never materializes the whole log:
the same code writes 10^4 rows for tests and 10^7+ for the bench.
"""

from __future__ import annotations

import json
import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

EPOCH_MS = 1_600_000_000_000  # fixed base timestamp (no wall-clock)

LOG_SCHEMA = pa.schema(
    [
        pa.field("lsn", pa.int64()),
        pa.field("segment", pa.int32()),
        pa.field("txn_id", pa.int64()),
        # GTID of the enclosing transaction, "server_uuid:txn" (the Header
        # gtid field, EntryProtocol.proto:32-36); null on heartbeats
        pa.field("gtid", pa.string()),
        pa.field("op", pa.string()),  # INSERT | UPDATE | DELETE | DDL
        pa.field("schema_name", pa.string()),
        pa.field("table_name", pa.string()),
        pa.field("pk_repo", pa.string()),
        pa.field("pk_path", pa.string()),
        pa.field("cols", pa.list_(pa.string())),  # column names of the after-image
        pa.field("vals", pa.list_(pa.string())),  # values as strings (Canal contract)
        pa.field("ddl_sql", pa.string()),
        pa.field("execute_time", pa.timestamp("ms")),
    ]
)

BASE_COLS = ["repo", "path", "commit", "lang", "content"]

_EXTS = ["py", "java", "go", "rs", "ts", "md", "c", "rb"]
_LANGS = {
    "py": "python", "java": "java", "go": "go", "rs": "rust",
    "ts": "typescript", "md": "markdown", "c": "c", "rb": "ruby",
}

# DDL schedule: (fraction of the log, sql). Additive by default; RENAME/DROP
# join via the rename_at / drop_at params (opt-in so default fixtures stay
# byte-identical).
DDL_SCHEDULE = [
    (0.30, "ALTER TABLE mytest.repos ADD COLUMN stars INT NULL"),
    (0.50, "ALTER TABLE mytest.repos MODIFY COLUMN stars BIGINT"),
    (0.70, "ALTER TABLE mytest.repos ADD COLUMN license VARCHAR(64) NULL"),
]
RENAME_SQL = "ALTER TABLE mytest.repos RENAME COLUMN lang TO language"
DROP_SQL = "ALTER TABLE mytest.repos DROP COLUMN commit"
# optional index DDL (EventType CINDEX analog; meta-only, no row effect);
# references `lang` so it also exercises alias resolution when combined
# with rename_at < index_at
INDEX_SQL = "ALTER TABLE mytest.repos ADD INDEX idx_lang (lang)"
# optional DCL query event (LogEventConvert.java:383 — a QUERY-class entry
# that is neither DML nor DDL; dropped when filterQueryDcl, else delivered
# to clients as a meta entry with no row/schema effect) at dcl_at fraction
DCL_SQL = "GRANT SELECT ON mytest.repos TO 'reader'@'%'"
# optional TRUNCATE event (EventType.TRUNCATE) at this fraction when
# truncate_at is passed to generate_fixture
TRUNCATE_SQL = "TRUNCATE TABLE mytest.repos"
_LICENSES = ["mit", "apache-2.0", "bsd-3", "gpl-3.0", "mpl-2.0"]


def _content_pool(rng: np.random.Generator, scale: float) -> list[str]:
    """~256 deterministic pseudo-code snippets, log-normal lengths (~scale avg chars)."""
    words = [
        "def", "return", "class", "import", "self", "for", "in", "if", "else",
        "while", "lambda", "yield", "async", "await", "raise", "try", "except",
        "value", "result", "index", "buffer", "stream", "batch", "apply",
        "merge", "commit", "offset", "schema", "table", "partition", "upsert",
    ]
    pool = []
    for i in range(256):
        n_chars = int(np.exp(rng.normal(np.log(max(scale, 16)), 0.8)))
        n_chars = int(np.clip(n_chars, 16, scale * 16))
        toks = rng.choice(words, size=max(4, n_chars // 7))
        lines = []
        line: list[str] = []
        for t in toks:
            line.append(str(t))
            if len(line) >= 8:
                lines.append("    ".join(line))
                line = []
        if line:
            lines.append(" ".join(line))
        pool.append(f"# snippet {i}\n" + "\n".join(lines))
    return pool


def _hex_ids(rng: np.random.Generator, n: int, nbytes: int = 20) -> list[str]:
    raw = rng.bytes(nbytes * n)
    return [raw[i * nbytes : (i + 1) * nbytes].hex() for i in range(n)]


class _KeyPool:
    """Deterministic universe of (repo, path) keys with Zipf repo skew."""

    def __init__(self, rng: np.random.Generator, total: int, zipf_s: float):
        n_repos = max(8, total // 64)
        ranks = np.arange(1, n_repos + 1, dtype=np.float64)
        w = ranks ** (-zipf_s)
        w /= w.sum()
        repo_ids = rng.choice(n_repos, size=total, p=w)
        self.repo = np.array(
            [f"org{r % 13}/repo{r}" for r in repo_ids], dtype=object
        )
        ext_ids = rng.integers(0, len(_EXTS), size=total)
        self.ext = np.array([_EXTS[e] for e in ext_ids], dtype=object)
        self.lang = np.array([_LANGS[e] for e in self.ext], dtype=object)
        # path unique per key index -> (repo, path) unique
        self.path = np.array(
            [f"src/m{k // 500}/f{k}.{self.ext[k]}" for k in range(total)],
            dtype=object,
        )
        self.total = total


def generate_fixture(
    out_dir: str,
    *,
    n_base: int = 1_000,
    n_events: int = 10_000,
    n_segments: int = 2,
    seed: int = 7,
    zipf_s: float = 1.15,
    content_scale: float = 400.0,
    p_insert: float = 0.35,
    p_update: float = 0.45,
    p_noise: float = 0.01,
    hot_frac: float = 0.2,
    truncate_at: float | None = None,
    p_partial: float = 0.0,
    rename_at: float | None = None,
    drop_at: float | None = None,
    index_at: float | None = None,
    dcl_at: float | None = None,
    txn_span: bool = False,
    xa_frac: float | None = None,
    force: bool = False,
) -> dict:
    """Generate base table + binlog segments; returns the fixture meta dict.

    Idempotent: if ``fixture_meta.json`` exists with identical params, the
    existing fixture is reused (the bench caches its input this way).
    """
    meta_path = os.path.join(out_dir, "fixture_meta.json")
    params = dict(
        n_base=n_base, n_events=n_events, n_segments=n_segments, seed=seed,
        zipf_s=zipf_s, content_scale=content_scale, p_insert=p_insert,
        p_update=p_update, p_noise=p_noise, hot_frac=hot_frac,
        truncate_at=truncate_at, p_partial=p_partial, version=7,
    )
    # opt-in keys only when set: default param dicts (and therefore cached
    # fixtures and their digests) stay byte-identical to earlier versions
    if rename_at is not None:
        params["rename_at"] = rename_at
    if drop_at is not None:
        params["drop_at"] = drop_at
    if index_at is not None:
        params["index_at"] = index_at
    if dcl_at is not None:
        params["dcl_at"] = dcl_at
    if txn_span:
        params["txn_span"] = True
    if xa_frac is not None:
        if txn_span:
            raise ValueError("xa_frac requires txn_span=False (XA terminal "
                             "markers live in the txn's own segment)")
        params["xa_frac"] = xa_frac
    if not force and os.path.exists(meta_path):
        with open(meta_path) as f:
            old = json.load(f)
        if old.get("params") == params and all(
            os.path.exists(os.path.join(out_dir, "binlog", s))
            for s in old.get("segments", [])
        ):
            return old
    # regenerating with DIFFERENT params: stale segments from a previous
    # (e.g. larger n_segments) generation would survive the rewrite and be
    # picked up by sorted-listdir readers — wipe the binlog dir first.
    # The stale META must go first: meta is the completion marker (written
    # last, below), so a generator killed mid-write must leave NO meta —
    # otherwise the next caller sees matching params over a partial segment
    # set and silently replays a truncated fixture.
    import shutil as _shutil

    if os.path.exists(meta_path):
        os.unlink(meta_path)
    _shutil.rmtree(os.path.join(out_dir, "binlog"), ignore_errors=True)

    rng = np.random.default_rng(seed)
    # deterministic source-server identity for GTIDs (MySQL server_uuid)
    import hashlib as _hashlib

    _uu = _hashlib.sha1(f"canal-ray-gtid-{seed}".encode()).hexdigest()
    server_uuid = f"{_uu[:8]}-{_uu[8:12]}-{_uu[12:16]}-{_uu[16:20]}-{_uu[20:32]}"
    pool_strings = _content_pool(rng, content_scale)
    n_pool = len(pool_strings)

    # key universe: base keys + enough for all possible inserts
    max_inserts = int(n_events * (p_insert + 0.05)) + n_segments + 16
    keys = _KeyPool(rng, n_base + max_inserts, zipf_s)

    os.makedirs(os.path.join(out_dir, "base"), exist_ok=True)
    os.makedirs(os.path.join(out_dir, "binlog"), exist_ok=True)

    # ---- base table (initial snapshot; lsn 0) ---------------------------
    base_idx = np.arange(n_base)
    base_cid = rng.integers(0, n_pool, size=n_base)
    base_commit = _hex_ids(rng, n_base)
    base_content = [pool_strings[c] + f"\n# rev 0.{k}" for k, c in zip(base_idx, base_cid)]
    base_tbl = pa.table(
        {
            "repo": pa.array(keys.repo[:n_base], type=pa.string()),
            "path": pa.array(keys.path[:n_base], type=pa.string()),
            "commit": pa.array(base_commit, type=pa.string()),
            "lang": pa.array(keys.lang[:n_base], type=pa.string()),
            "content": pa.array(base_content, type=pa.string()),
        }
    )
    pq.write_table(
        base_tbl,
        os.path.join(out_dir, "base", "repos.parquet"),
        # same wire-format rationale as the segments below: near-unique
        # payload columns (content/path/commit) skip parquet dictionary
        # encoding (index indirection ~2x the read CPU for no byte win);
        # zstd-1 halves bytes vs snappy at equal decode CPU
        compression="zstd",
        compression_level=1,
        use_dictionary=["repo", "lang"],
    )

    # ---- DDL schedule at absolute LSNs ----------------------------------
    ddl_lsns = {}
    for frac, sql in DDL_SCHEDULE:
        lsn = max(2, int(n_events * frac))
        ddl_lsns[lsn] = sql
    rename_lsn = None
    if rename_at is not None:
        rename_lsn = max(2, int(n_events * rename_at))
        while rename_lsn in ddl_lsns:
            rename_lsn += 1
        ddl_lsns[rename_lsn] = RENAME_SQL
    drop_lsn = None
    if drop_at is not None:
        drop_lsn = max(2, int(n_events * drop_at))
        while drop_lsn in ddl_lsns:
            drop_lsn += 1
        ddl_lsns[drop_lsn] = DROP_SQL
    if index_at is not None:
        index_lsn = max(2, int(n_events * index_at))
        while index_lsn in ddl_lsns:
            index_lsn += 1
        ddl_lsns[index_lsn] = INDEX_SQL
    truncate_lsn = None
    if truncate_at is not None:
        truncate_lsn = max(3, int(n_events * truncate_at))
        while truncate_lsn in ddl_lsns:
            truncate_lsn += 1
    dcl_lsn = None
    if dcl_at is not None:
        dcl_lsn = max(2, int(n_events * dcl_at))
        while dcl_lsn in ddl_lsns or dcl_lsn == truncate_lsn:
            dcl_lsn += 1
    stars_lsn = min(l for l, s in ddl_lsns.items() if "ADD COLUMN stars" in s)
    widen_lsn = min(l for l, s in ddl_lsns.items() if "MODIFY" in s)
    license_lsn = min(l for l, s in ddl_lsns.items() if "license" in s)

    n_inserted = 0  # keys consumed from pool beyond base
    next_txn = 1
    lsn0 = 1
    xa_rollback_ids: list[int] = []
    seg_sizes = [n_events // n_segments] * n_segments
    seg_sizes[-1] += n_events - sum(seg_sizes)
    segments = []

    # txn_span=True drops the "transactions never span segments" contract:
    # one GLOBAL txn assignment is sliced per segment, so transactions
    # straddle segment (and therefore naive epoch) boundaries — the input
    # shape Canal's EventTransactionBuffer exists for; consumed by
    # CdcConfig.txn_aligned_epochs (ack points shifted to txn boundaries)
    global_txn = None
    if txn_span:
        sizes = rng.integers(1, 51, size=n_events // 2 + 4)
        rep = np.repeat(np.arange(len(sizes)) + 1, sizes)[:n_events]
        if len(rep) < n_events:
            rep = np.concatenate([rep, np.full(n_events - len(rep), rep[-1])])
        global_txn = rep.astype(np.int64)

    for seg in range(n_segments):
        n_ev = seg_sizes[seg]
        lsns = np.arange(lsn0, lsn0 + n_ev, dtype=np.int64)

        # op selection ------------------------------------------------------
        u = rng.random(n_ev)
        ops = np.full(n_ev, "UPDATE", dtype=object)
        ops[u < p_insert] = "INSERT"
        ops[u >= p_insert + p_update] = "DELETE"
        noise = rng.random(n_ev) < p_noise
        ddl_mask = np.isin(lsns, list(ddl_lsns.keys()))
        ops[ddl_mask] = "DDL"
        noise[ddl_mask] = False
        tr_mask = np.zeros(n_ev, dtype=bool)
        if truncate_lsn is not None:
            tr_mask = lsns == truncate_lsn
            ops[tr_mask] = "TRUNCATE"
            noise[tr_mask] = False
        dcl_mask = np.zeros(n_ev, dtype=bool)
        if dcl_lsn is not None:
            dcl_mask = lsns == dcl_lsn
            ops[dcl_mask] = "DCL"
            noise[dcl_mask] = False

        ins_mask = (ops == "INSERT") & ~noise
        # target selection for UPDATE/DELETE: any key inserted so far
        n_before = n_base + n_inserted
        inserted_so_far = n_before + np.cumsum(ins_mask) - ins_mask  # exclusive
        tgt_u = rng.random(n_ev)
        targets = np.minimum(
            (tgt_u * np.maximum(inserted_so_far, 1)).astype(np.int64),
            np.maximum(inserted_so_far - 1, 0),
        )
        # hot-key boost: a fraction of updates hammer the first 100 keys
        hot = (rng.random(n_ev) < hot_frac) & (ops == "UPDATE")
        targets[hot] = (tgt_u[hot] * min(100, n_before or 1)).astype(np.int64)
        # events with no possible target become INSERTs
        impossible = (inserted_so_far == 0) & ((ops == "UPDATE") | (ops == "DELETE"))
        ops[impossible] = "INSERT"
        ins_mask = (ops == "INSERT") & ~noise

        # key index per event ----------------------------------------------
        key_idx = targets.copy()
        ins_positions = np.flatnonzero(ins_mask)
        key_idx[ins_positions] = n_base + n_inserted + np.arange(len(ins_positions))
        n_inserted += len(ins_positions)

        # transactions: sizes 1..50. Default: never spanning segments (the
        # original generator contract; epochs align to segments). With
        # txn_span=True the global assignment is sliced, so txns straddle
        # segment boundaries (exercises txn-aligned epoch planning).
        if global_txn is not None:
            txn_rep = global_txn[lsn0 - 1 : lsn0 - 1 + n_ev]
        else:
            txn_sizes = rng.integers(1, 51, size=n_ev // 2 + 2)
            txn_rep = np.repeat(np.arange(len(txn_sizes)) + next_txn, txn_sizes)[:n_ev]
            if len(txn_rep) < n_ev:
                txn_rep = np.concatenate(
                    [txn_rep, np.full(n_ev - len(txn_rep), txn_rep[-1] if len(txn_rep) else next_txn)]
                )
            next_txn = int(txn_rep[-1]) + 1

        # payload values ----------------------------------------------------
        commit = np.array(_hex_ids(rng, n_ev), dtype=object)
        cid = rng.integers(0, n_pool, size=n_ev)
        stars_small = rng.integers(0, 1_000, size=n_ev)
        stars_big = rng.integers(0, 10**12, size=n_ev)
        lic = rng.integers(0, len(_LICENSES), size=n_ev)

        # noise events for a second table (exercises regex filter + routing);
        # pk = (id, note-kind) so a multi-table job can subscribe to it
        ops[noise] = "INSERT"
        # heartbeat liveness events (EventType.MHEARTBEAT analog) — no table,
        # no payload; consumers must skip them while their lsns advance
        # NOTE: heartbeat conversion happens AFTER insert accounting, so an
        # insert-selected lsn that becomes a heartbeat still consumed a key
        # index (n_inserted counts it; later updates may target the phantom
        # key). Benign by the upsert contract — engine and oracle both treat
        # a full-image UPDATE of an absent key as an insert — and kept as-is
        # because reordering would change every cached fixture's bytes.
        hb = (lsns % 997 == 0) & ~ddl_mask & ~noise & ~tr_mask & ~dcl_mask
        ops[hb] = "MHEARTBEAT"

        # XA transactions (EventType.XACOMMIT/XAROLLBACK,
        # EntryProtocol.proto:202-222): a fraction of transactions terminate
        # with an explicit XA marker — XACOMMIT keeps the txn's rows,
        # XAROLLBACK retroactively voids them (engine and oracle both exclude
        # rolled-back txns' rows from the lake). The marker REPLACES the
        # txn's final event (lsns stay contiguous) and always lives in the
        # txn's own segment (the txn_span=False contract). Txns containing a
        # DDL/TRUNCATE/heartbeat are never XA (MySQL DDL implicitly commits,
        # so it cannot sit inside an XA transaction).
        xa_mask = np.zeros(n_ev, dtype=bool)
        if xa_frac:
            uniq, first_idx = np.unique(txn_rep, return_index=True)
            counts = np.diff(np.concatenate([first_idx, [n_ev]]))
            last_idx = first_idx + counts - 1
            grp = np.searchsorted(uniq, txn_rep)
            has_meta = (
                np.bincount(grp[ddl_mask | tr_mask | hb | dcl_mask], minlength=len(uniq))
                > 0
            )
            is_xa = (rng.random(len(uniq)) < xa_frac) & ~has_meta
            rolls = rng.random(len(uniq)) < 0.4  # of XA txns, ~40% roll back
            xa_idx = last_idx[is_xa]
            ops[xa_idx] = np.where(rolls[is_xa], "XAROLLBACK", "XACOMMIT")
            xa_mask[xa_idx] = True
            noise[xa_idx] = False  # a converted audit row is a marker now
            xa_rollback_ids.extend(int(t) for t in uniq[is_xa & rolls])

        has_image = ((ops == "INSERT") | (ops == "UPDATE")) & ~noise
        has_stars = lsns > stars_lsn
        widened = lsns > widen_lsn
        has_license = lsns > license_lsn
        renamed = lsns > rename_lsn if rename_lsn is not None else np.zeros(n_ev, bool)
        dropped = lsns > drop_lsn if drop_lsn is not None else np.zeros(n_ev, bool)

        # partial (minimal row image) updates: a subset of non-PK columns
        # only — Canal's Column.updated-flags semantics (binlog_row_image=
        # MINIMAL; RdbSyncService updates only changed columns). Drawn only
        # when enabled so default fixtures stay byte-identical.
        partial = np.zeros(n_ev, dtype=bool)
        patch_bits = None
        if p_partial > 0:
            partial = (rng.random(n_ev) < p_partial) & (ops == "UPDATE") & ~noise
            # bits: commit, lang, content, stars, license (schema order)
            patch_bits = rng.integers(0, 2, size=(n_ev, 5)).astype(bool)
            patch_bits[:, 3] &= has_stars
            patch_bits[:, 4] &= has_license
            patch_bits[:, 0] &= ~dropped  # commit gone after the DROP
            none = ~patch_bits.any(axis=1)
            patch_bits[none & ~dropped, 0] = True  # at least commit ...
            patch_bits[none & dropped, 2] = True  # ... or content post-drop

        repo_arr = keys.repo[key_idx]
        path_arr = keys.path[key_idx]
        lang_arr = keys.lang[key_idx]

        # build cols/vals list columns vectorized (string transport, Canal
        # Column model): one flat values buffer + offsets; null offsets mark
        # image-less rows (DELETE/DDL/TRUNCATE/HEARTBEAT)
        widths = np.zeros(n_ev, dtype=np.int64)
        widths[has_image] = (
            5
            + has_stars[has_image].astype(np.int64)
            + has_license[has_image].astype(np.int64)
            - dropped[has_image].astype(np.int64)  # commit gone post-DROP
        )
        if partial.any():
            widths[partial] = patch_bits[partial].sum(axis=1)
        widths[noise] = 2
        cum = np.concatenate([[0], np.cumsum(widths)])
        val_buf = np.empty(int(cum[-1]), dtype=object)
        col_buf = np.empty(int(cum[-1]), dtype=object)
        starts = cum[:-1]

        img = has_image & ~partial
        pool_arr = np.array(pool_strings, dtype=object)
        stars_str = np.where(
            widened,
            np.char.mod("%d", stars_big).astype(object),
            np.char.mod("%d", stars_small).astype(object),
        )
        lic_arr = np.array(_LICENSES, dtype=object)[lic]
        # full-image fill per ERA: the writer's column list follows the live
        # schema (stars/license appear; lang renames; commit drops), so rows
        # are grouped by their layout era — era regions are contiguous lsn
        # ranges, at most a handful per segment
        value_src = {
            "repo": repo_arr, "path": path_arr, "commit": commit,
            "lang": lang_arr, "language": lang_arr,
            "stars": stars_str, "license": lic_arr,
        }
        era_code = (
            has_stars.astype(np.int64)
            + 2 * has_license.astype(np.int64)
            + 4 * renamed.astype(np.int64)
            + 8 * dropped.astype(np.int64)
        )
        for code in np.unique(era_code[img]):
            rows = img & (era_code == code)
            names = ["repo", "path"]
            if not (code & 8):
                names.append("commit")
            names.append("language" if (code & 4) else "lang")
            names.append("content")
            if code & 1:
                names.append("stars")
            if code & 2:
                names.append("license")
            content_v = np.add(
                pool_arr[cid[rows]],
                np.add(
                    np.full(int(rows.sum()), "\n# rev ", dtype=object),
                    np.char.mod("%d", lsns[rows]).astype(object),
                ),
            )
            s_rows = starts[rows]
            for pos, name in enumerate(names):
                val_buf[s_rows + pos] = (
                    content_v if name == "content" else value_src[name][rows]
                )
                col_buf[s_rows + pos] = name
        if partial.any():
            # pattern-wise fill for patch images (<=32 distinct subsets),
            # sub-split by rename era (the lang bit's written NAME changes)
            pattern_ids = patch_bits @ (1 << np.arange(5))
            for pid_v in np.unique(pattern_ids[partial]):
                prow = partial & (pattern_ids == pid_v)
                bits = [(pid_v >> j) & 1 for j in range(5)]
                for rflag in (False, True):
                    rows = prow & (renamed == rflag)
                    if not rows.any():
                        continue
                    patch_names = [
                        "commit", "language" if rflag else "lang", "content",
                        "stars", "license",
                    ]
                    pos = 0
                    for j, on in enumerate(bits):
                        if not on:
                            continue
                        name = patch_names[j]
                        if name == "content":
                            v = np.add(
                                pool_arr[cid[rows]],
                                np.add(
                                    np.full(int(rows.sum()), "\n# rev ", dtype=object),
                                    np.char.mod("%d", lsns[rows]).astype(object),
                                ),
                            )
                        else:
                            v = value_src[name][rows]
                        val_buf[starts[rows] + pos] = v
                        col_buf[starts[rows] + pos] = name
                        pos += 1

        s_noise = starts[noise]
        val_buf[s_noise + 0] = np.char.mod("%d", lsns[noise]).astype(object)
        val_buf[s_noise + 1] = np.add(
            np.full(int(noise.sum()), "audit row ", dtype=object),
            np.char.mod("%d", lsns[noise] % 7).astype(object),
        )
        col_buf[s_noise + 0] = "id"
        col_buf[s_noise + 1] = "note"

        offsets_obj = cum.astype(object)
        for i in np.flatnonzero(widths == 0):
            offsets_obj[i] = None
        pa_offsets = pa.array(offsets_obj, type=pa.int32())
        vals_arr = pa.ListArray.from_arrays(pa_offsets, pa.array(val_buf, type=pa.string()))
        cols_arr = pa.ListArray.from_arrays(pa_offsets, pa.array(col_buf, type=pa.string()))

        table_name = np.where(noise, "audit", "repos").astype(object)
        table_name[ddl_mask | tr_mask | dcl_mask] = "repos"
        table_name[hb | xa_mask] = ""  # txn-scoped markers carry no table
        pk_repo = repo_arr.copy()
        pk_path = path_arr.copy()
        pk_repo[noise] = np.array([str(int(l)) for l in lsns[noise]], dtype=object)
        pk_path[noise] = "audit"
        pk_repo[ddl_mask | hb | tr_mask | xa_mask | dcl_mask] = None
        pk_path[ddl_mask | hb | tr_mask | xa_mask | dcl_mask] = None
        # GTID = "server_uuid:txn" (Header.gtid, EntryProtocol.proto:32-36);
        # heartbeats are server liveness, not transaction events -> null
        gtid = np.add(
            np.full(n_ev, server_uuid + ":", dtype=object),
            np.char.mod("%d", txn_rep).astype(object),
        )
        gtid[hb] = None
        ddl_sql = np.full(n_ev, None, dtype=object)
        for i in np.flatnonzero(ddl_mask):
            ddl_sql[i] = ddl_lsns[int(lsns[i])]
        for i in np.flatnonzero(tr_mask):
            ddl_sql[i] = TRUNCATE_SQL
        for i in np.flatnonzero(dcl_mask):
            ddl_sql[i] = DCL_SQL

        seg_tbl = pa.table(
            {
                "lsn": pa.array(lsns, type=pa.int64()),
                "segment": pa.array(np.full(n_ev, seg, dtype=np.int32)),
                "txn_id": pa.array(txn_rep.astype(np.int64)),
                "gtid": pa.array(gtid, type=pa.string()),
                "op": pa.array(ops, type=pa.string()),
                "schema_name": pa.array(["mytest"] * n_ev, type=pa.string()),
                "table_name": pa.array(table_name, type=pa.string()),
                "pk_repo": pa.array(pk_repo, type=pa.string()),
                "pk_path": pa.array(pk_path, type=pa.string()),
                "cols": cols_arr,
                "vals": vals_arr,
                "ddl_sql": pa.array(ddl_sql, type=pa.string()),
                "execute_time": pa.array(EPOCH_MS + lsns * 10, type=pa.timestamp("ms")),
            },
            schema=LOG_SCHEMA,
        )
        seg_path = os.path.join(out_dir, "binlog", f"segment_{seg:05d}.parquet")
        # Wire-format byte diet at the SOURCE (the replay's dominant read
        # cost, measured: dict-decode of the near-unique `vals`/`pk_path`
        # columns is ~2x the whole segment's read CPU; zstd-1 halves the
        # bytes vs snappy at equal decode CPU). Dictionary encoding stays
        # ON only for the bounded-cardinality columns; 64k row groups keep
        # the stats-pruning granularity (lsn windows, XA marker scan,
        # txn-boundary tail reads) unchanged.
        pq.write_table(
            seg_tbl,
            seg_path,
            row_group_size=64 * 1024,
            compression="zstd",
            compression_level=1,
            use_dictionary=["op", "schema_name", "table_name", "pk_repo", "gtid"],
        )
        segments.append(seg_path)
        lsn0 += n_ev

    meta = {
        "params": params,
        "n_keys_total": int(keys.total),
        "n_inserted": int(n_inserted),
        "ddl_lsns": {str(k): v for k, v in ddl_lsns.items()},
        "truncate_lsn": truncate_lsn,
        "dcl_lsn": dcl_lsn,
        "rename_lsn": rename_lsn,
        "drop_lsn": drop_lsn,
        "segments": [os.path.basename(s) for s in segments],
        "base": "base/repos.parquet",
        "last_lsn": int(lsn0 - 1),
        "server_uuid": server_uuid,
        "xa_rollback_txns": sorted(xa_rollback_ids),
    }
    with open(meta_path, "w") as f:
        json.dump(meta, f, indent=1, sort_keys=True)
    return meta


def segment_paths(fixture_dir: str) -> list[str]:
    from canal_ray.checkpoint import list_numbered

    return list_numbered(os.path.join(fixture_dir, "binlog"))
