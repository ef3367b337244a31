"""Row-level predicate filter (AviaterELFilter analog): grammar unit tests +
an end-to-end replay whose filtered lake equals the filtered oracle state."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pytest

from canal_ray.config import CdcConfig
from canal_ray.loggen import generate_fixture
from canal_ray.oracle import replay_oracle, state_digest
from canal_ray.pipeline import CdcJob
from canal_ray.rowfilter import compile_predicate


def _raw_batch() -> pa.Table:
    """Hand-built raw log batch: full images, a minimal image (patch), a
    DELETE without image, a heartbeat, and a post-DDL wider image."""
    rows = [
        # lsn, op, repo, path, cols, vals
        (1, "INSERT", "r1", "a", ["repo", "path", "commit", "lang", "content"],
         ["r1", "a", "c1", "python", "print(1)"]),
        (2, "INSERT", "r2", "b", ["repo", "path", "commit", "lang", "content"],
         ["r2", "b", "c2", "go", "func main()"]),
        (3, "UPDATE", "r1", "a", ["commit", "content"],  # minimal row image
         ["c3", "print(2)"]),
        (4, "DELETE", "r2", "b", None, None),  # no after-image
        (5, "MHEARTBEAT", None, None, None, None),
        (6, "INSERT", "r3", "c", ["repo", "path", "commit", "lang", "content", "stars"],
         ["r3", "c", "c4", "python", "x=1", "750"]),
        (7, "INSERT", "r4", "d", ["repo", "path", "commit", "lang", "content", "stars"],
         ["r4", "d", "c5", "rust", "fn main()", "not-a-number"]),
    ]
    return pa.table(
        {
            "lsn": pa.array([r[0] for r in rows], type=pa.int64()),
            "op": pa.array([r[1] for r in rows], type=pa.string()),
            "schema_name": pa.array(["mytest"] * len(rows), type=pa.string()),
            "table_name": pa.array(["repos"] * len(rows), type=pa.string()),
            "pk_repo": pa.array([r[2] for r in rows], type=pa.string()),
            "pk_path": pa.array([r[3] for r in rows], type=pa.string()),
            "cols": pa.array([r[4] for r in rows], type=pa.list_(pa.string())),
            "vals": pa.array([r[5] for r in rows], type=pa.list_(pa.string())),
        }
    )


def _mask(expr: str) -> list[bool]:
    return compile_predicate(expr)(_raw_batch()).tolist()


def test_string_equality_and_name_resolution_from_cols():
    # `lang` resolves per-row from the image's own cols list: absent on the
    # patch (row 3), the DELETE, and the heartbeat -> null -> False
    assert _mask("lang == 'python'") == [True, False, False, False, False, True, False]


def test_pk_columns_map_to_wire_pk():
    assert _mask("repo == 'r1'") == [True, False, True, False, False, False, False]
    assert _mask("path in ('b', 'd')") == [False, True, False, True, False, False, True]


def test_numeric_compare_safe_casts_and_nulls_drop():
    # stars only exists post-DDL; 'not-a-number' fails the cast -> null -> False
    assert _mask("stars >= 500") == [False] * 5 + [True, False]
    assert _mask("stars < 500") == [False] * 7


def test_meta_fields_and_boolean_composition():
    assert _mask("op == 'DELETE' or lang == 'python'") == [
        True, False, False, True, False, True, False,
    ]
    assert _mask("lang == 'python' and not contains(content, 'x=')") == [
        True, False, False, False, False, False, False,
    ]
    assert _mask("lsn > 2 and lsn <= 6") == [False, False, True, True, True, True, False]


def test_helpers_and_absence_tests():
    assert _mask("matches(commit, 'c[13]')") == [True, False, True, False, False, False, False]
    assert _mask("startswith(content, 'print')") == [True, False, True, False, False, False, False]
    assert _mask("length(content) > 8") == [False, True, False, False, False, False, True]
    # explicit absence test keeps imageless rows
    assert _mask("stars == None") == [True, True, True, True, True, False, False]
    assert _mask("lang != None") == [True, True, False, False, False, True, True]
    assert _mask("lang not in ('go', 'rust')") == [
        True, False, False, False, False, True, False,
    ]


@pytest.mark.parametrize(
    "bad",
    [
        "__import__('os').system('x')",
        "lang.__class__",
        "(lambda: 1)()",
        "open('/etc/passwd')",
        "lang == 'a' if True else 'b'",
        "[x for x in lang]",
        "lang + 'x' == 'pythonx'",
        "1 < lsn < 5",
        "matches(lang, lang)",
    ],
)
def test_unsafe_or_unsupported_expressions_rejected(bad):
    with pytest.raises(ValueError):
        compile_predicate(bad)


def test_empty_batch():
    pred = compile_predicate("lang == 'python'")
    assert pred(_raw_batch().slice(0, 0)).tolist() == []


# ------------------------------------------------- end-to-end vs the oracle
def test_filtered_replay_equals_filtered_oracle(ray_session, tmp_path):
    """`op == 'DELETE' or lang == 'python'`: deletes always apply (they carry
    no image, like Canal's before-image-only DELETE), inserts/updates only
    for python repos. `lang` is key-stable in the fixture, so the final lake
    must equal the unfiltered oracle state restricted to lang == 'python'."""
    d = str(tmp_path / "fix")
    generate_fixture(d, n_base=400, n_events=4_000, n_segments=4, seed=71)
    cfg = CdcConfig(
        log_dir=f"{d}/binlog", lake_dir=str(tmp_path / "lake"),
        base_table=f"{d}/base/repos.parquet", num_partitions=4,
        epoch_segments=2, row_filter="op == 'DELETE' or lang == 'python'",
    )
    job = CdcJob(cfg)
    job.run()
    got = job.state_pandas()
    oracle_df, _ = replay_oracle(d, list(cfg.initial_schema))
    want = oracle_df[oracle_df["lang"] == "python"].reset_index(drop=True)
    assert len(want) > 0 and len(want) < len(oracle_df)  # filter actually bites
    assert state_digest(got) == state_digest(want)


# --------------------------------------------- vectorization properties
def _random_batch(seed: int, n: int = 60) -> pa.Table:
    """Random raw-log batch with full images, patches, deletes, heartbeats,
    post-DDL columns, and numeric-garbage values."""
    rng = np.random.default_rng(seed)
    ops, repos, paths, cols, vals, lsns = [], [], [], [], [], []
    langs = ["python", "go", "rust", None]
    for i in range(n):
        kind = rng.integers(0, 5)
        lsns.append(i + 1)
        if kind == 4:
            ops.append("MHEARTBEAT"); repos.append(None); paths.append(None)
            cols.append(None); vals.append(None)
            continue
        repos.append(f"r{rng.integers(0, 5)}")
        paths.append(f"p{rng.integers(0, 5)}")
        if kind == 3:
            ops.append("DELETE"); cols.append(None); vals.append(None)
            continue
        ops.append("UPDATE" if kind == 2 else "INSERT")
        if kind == 2 and rng.random() < 0.5:  # minimal image
            c = ["commit", "content"]
            v = [f"c{i}", f"body{i}"]
        else:
            c = ["repo", "path", "commit", "lang", "content"]
            v = [repos[-1], paths[-1], f"c{i}",
                 langs[rng.integers(0, 4)], f"body{i} x" * rng.integers(1, 4)]
            if rng.random() < 0.4:
                c = c + ["stars"]
                v = v + [str(rng.integers(0, 1000)) if rng.random() < 0.8 else "junk"]
        cols.append(c); vals.append(v)
    return pa.table(
        {
            "lsn": pa.array(lsns, type=pa.int64()),
            "op": pa.array(ops, type=pa.string()),
            "schema_name": pa.array(["mytest"] * n, type=pa.string()),
            "table_name": pa.array(["repos"] * n, type=pa.string()),
            "pk_repo": pa.array(repos, type=pa.string()),
            "pk_path": pa.array(paths, type=pa.string()),
            "cols": pa.array(cols, type=pa.list_(pa.string())),
            "vals": pa.array(vals, type=pa.list_(pa.string())),
        }
    )


_PREDICATES = [
    "lang == 'python'",
    "op == 'DELETE' or lang == 'python'",
    "stars >= 500",
    "stars == None",
    "lang in ('go', 'rust') and length(content) > 8",
    "matches(commit, 'c[0-9]') and not startswith(content, 'body1')",
    "repo == 'r1' or (path == 'p2' and lang != None)",
    "lsn > 10 and lsn <= 50",
]


@pytest.mark.parametrize("expr", _PREDICATES)
def test_vectorized_mask_equals_per_row_eval(expr):
    """Batch evaluation must equal evaluating each row alone (slice of 1) and
    be invariant under row permutation — catches flat-offset/searchsorted
    bugs in the cols/vals name resolution."""
    pred = compile_predicate(expr)
    for seed in range(5):
        batch = _random_batch(seed)
        full = pred(batch)
        singles = np.array(
            [pred(batch.slice(i, 1))[0] for i in range(batch.num_rows)]
        )
        assert (full == singles).all(), expr
        perm = np.random.default_rng(seed + 99).permutation(batch.num_rows)
        shuffled = pred(batch.take(pa.array(perm)))
        assert (shuffled == full[perm]).all(), expr


def test_compile_never_crashes_on_garbage():
    """Fuzz: arbitrary strings either raise ValueError/SyntaxError-as-ValueError
    at compile time or produce a predicate that evaluates without crashing —
    never an exec/import, never a hang, never a non-ValueError escape."""
    rng = np.random.default_rng(7)
    corpus = list("abc()'\"=<>!&|.,0123456789 _%[]{}xyz")
    batch = _raw_batch()
    compiled = 0
    for _ in range(300):
        n = int(rng.integers(1, 40))
        s = "".join(rng.choice(corpus) for _ in range(n))
        try:
            pred = compile_predicate(s)
        except (ValueError, SyntaxError):
            continue
        mask = pred(batch)  # must evaluate cleanly if it compiled
        assert len(mask) == batch.num_rows
        compiled += 1
    # structured variants around the real grammar
    for s in [
        "lang == 'py' or", "== 'x'", "()", "not", "lang ==", "in ('a')",
        "matches(lang)", "length()", "lang in []", "None == None",
        "stars >= 'abc'", "'a' == lang",
    ]:
        try:
            pred = compile_predicate(s)
            pred(batch)
        except (ValueError, SyntaxError):
            pass


def test_not_agrees_with_negated_comparison_under_nulls():
    """SQL three-valued logic: `not (x == v)` must equal `x != v` even on
    rows where the column is absent (both null -> dropped)."""
    assert _mask("not (lang == 'python')") == _mask("lang != 'python'")
    assert _mask("not (stars >= 500)") == _mask("stars < 500")
    assert _mask("not (lang in ('go', 'rust'))") == _mask("lang not in ('go', 'rust')")
    # null propagates through and/or (Kleene): null or True = True
    assert _mask("lang == 'nope' or op != None") == [True] * 7
