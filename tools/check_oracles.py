"""Local replica of the driver's correctness harness.

Runs every registered query on Spark and its oracle SQL on DuckDB over the
same parquet tables, then compares row count, column names, and an
order-insensitive value hash (columns sorted by name, rows sorted by their
string form). Usage:

    python tools/check_oracles.py [sf_dir] [name ...]
    python tools/check_oracles.py --no-cache [sf_dir] [name ...]

The gate memoizes shared training families (r5 VERDICT task 7): each
composed component's SQL — and each iterative-training CTE chain (BPE
doc counts, the Lloyd fit, the quality-model rounds) — is materialized
ONCE per run as a DuckDB temp table, and every oracle that embeds that
exact SQL text verbatim is rewritten to select from the table instead of
re-replaying the training. Because the rewrite only ever swaps a
verbatim-embedded query text for its own materialized result, pass/fail
is identical to the uncached gate (``--no-cache`` runs the original SQL
for comparison). This cache exists only in this local replica — the
registered oracle strings the driver runs are untouched and
self-contained.
"""

from __future__ import annotations

import hashlib
import sys
import time

import duckdb
import pandas as pd


def build_cache_rules(registry) -> list[dict]:
    """Replacement rules, two kinds: a *component* rule's needle is a
    registered query's full SQL (compositions embed it verbatim inside
    parens); a *fragment* rule's needle is a shared CTE chain whose
    exported CTEs compositions reference downstream."""
    from topic_modeling_ajin_spark.operators import bpe, clustering, quality_model

    rules: list[dict] = []
    for name in (
        "quality_score",
        "ngram_lm_perplexity",
        "quality_model_score",
        "quality_panel",
        "curation_filter_report",
        "fingerprint_dedup",
        "near_dup_discard",
        "mixture_sample",
        "bpe_token_counts",
        "semantic_dedup",
        "chunk_dedup",
        "doc_boilerplate",
        "ann_cosine_topk",
        "bm25_topk",
        "ivf_cosine_topk",
        "training_corpus_manifest",
        "dsir_logweights",
        # r7 verdict task 7: the new long poles re-replay these fragments
        "winnowing_overlap_pairs",
        "doc_winnow_boilerplate",
        "doc_decontam",
        "strip_boilerplate_chunks",
        "strip_savings_report",
        "training_corpus_manifest_strict",
        "training_corpus_manifest_winnow",
        "training_corpus_manifest_decontam",
        "training_corpus_manifest_stripped",
        # r9: the token-budget mixture chain (the tokens manifest embeds
        # the sampler verbatim; future compositions embed the manifest)
        "mixture_sample_tokens",
        "training_corpus_manifest_tokens",
        # r9: the data card composes the token funnel verbatim
        "curation_funnel_tokens",
    ):
        spec = registry.get(name)
        if spec is not None and spec.sql is not None:
            rules.append(
                {"id": f"c_{name}", "kind": "component", "needle": spec.sql}
            )
    rules.append(
        {
            "id": "f_bpe_lens",
            "kind": "fragment",
            "needle": bpe._sql_bpe_doc_counts(),
            "exports": ["lens"],
        }
    )
    # the bare training-rounds chain (no lens): embedded directly by
    # bpe_merges/bpe_encode and the stripped manifest's BPE re-count.
    # Exports cover every CTE referenced downstream of the chain.
    rules.append(
        {
            "id": "f_bpe_rounds",
            "kind": "fragment",
            "needle": bpe._sql_bpe_rounds(bpe.BPE_MERGES),
            "exports": [f"seq{bpe.BPE_MERGES}"]
            + [f"best{t}" for t in range(1, bpe.BPE_MERGES + 1)],
        }
    )
    rules.append(
        {
            "id": "f_lloyd",
            "kind": "fragment",
            "needle": clustering._sql_lloyd(
                clustering.LLOYD_K, clustering.LLOYD_ITERS
            ),
            "exports": [
                "pts",
                f"a{clustering.LLOYD_ITERS}",
                f"c{clustering.LLOYD_ITERS - 1}",
            ],
        }
    )
    rules.append(
        {
            "id": "f_qm_rounds",
            "kind": "fragment",
            "needle": quality_model._sql_rounds(quality_model.QM_ITERS),
            "exports": [
                f"p{quality_model.QM_ITERS + 1}",
                f"w{quality_model.QM_ITERS}",
                "lab",
            ],
        }
    )

    from topic_modeling_ajin_spark.operators import dedup, plsa

    rules.append(
        {
            "id": "f_plsa",
            "kind": "fragment",
            "needle": plsa._sql_plsa(plsa.PLSA_ITERS),
            "exports": [f"phi{plsa.PLSA_ITERS}", f"theta{plsa.PLSA_ITERS}"],
        }
    )
    rules.append(
        {
            "id": "f_power_pca",
            "kind": "fragment",
            "needle": clustering._sql_power_pca(),
            "exports": [
                f"v{clustering.PCA_ITERS}",
                f"n{clustering.PCA_ITERS}",
                "cpts",
            ],
        }
    )
    rules.append(
        {
            "id": "f_pq",
            "kind": "fragment",
            "needle": clustering._sql_pq_ctes()[0],
            "exports": ["pts"]
            + [
                f"a{clustering.PQ_ITERS}_s{m}"
                for m in range(clustering.PQ_M)
            ]
            + [
                f"c{clustering.PQ_ITERS - 1}_s{m}"
                for m in range(clustering.PQ_M)
            ],
        }
    )
    rules.append(
        {
            "id": "f_ivfpq",
            "kind": "fragment",
            "needle": clustering._sql_ivfpq(),
            "exports": ["pts", f"c{clustering.LLOYD_ITERS - 1}", "res"]
            + [
                f"ra{clustering.IVFPQ_ITERS}_r{m}"
                for m in range(clustering.PQ_M)
            ]
            + [
                f"rc{clustering.IVFPQ_ITERS - 1}_r{m}"
                for m in range(clustering.PQ_M)
            ],
        }
    )
    from topic_modeling_ajin_spark.operators import unigram_lm

    rules.append(
        {
            "id": "f_unigram",
            "kind": "fragment",
            "needle": unigram_lm._sql_unigram(),
            "exports": ["seg2", "p0set", "c2", "meta2"],
        }
    )
    rules.append(
        {
            "id": "f_cc",
            "kind": "fragment",
            "needle": (
                f"{dedup._simhash_edges_sql()},\n{dedup._sql_cc(dedup.CC_STEPS)}"
            ),
            "exports": [f"l{dedup.CC_STEPS}", "t"],
        }
    )
    return rules


class OracleCache:
    """Lazily materializes rules as temp tables and rewrites oracle SQL.
    Rules build innermost-first (shortest needle), apply outermost-first
    (longest needle) so nested compositions collapse to their outermost
    cached table."""

    def __init__(self, con, rules: list[dict]):
        self.con = con
        self.rules = rules
        self.built: dict[str, str] = {}  # rule id -> replacement text

    def _rewrite(self, sql: str) -> str:
        for r in sorted(
            (r for r in self.rules if r["id"] in self.built),
            key=lambda r: -len(r["needle"]),
        ):
            rep = self.built[r["id"]]
            if r["kind"] == "component":
                # anchored to the parenthesized embedding compositions
                # use — a blind substring replace could rewrite an
                # unrelated construct that happens to contain the needle
                # (r6 advice). The bare-equality case is a component's
                # own top-level oracle.
                if sql == r["needle"]:
                    sql = rep
                else:
                    sql = sql.replace(
                        "(" + r["needle"] + ")", "(" + rep + ")"
                    )
            else:
                sql = sql.replace(r["needle"], rep)
        return sql

    def _ensure(self, rule: dict) -> None:
        if rule["id"] in self.built:
            return
        t0 = time.time()
        inner = self._rewrite(rule["needle"])
        if rule["kind"] == "component":
            tbl = f"oc_{rule['id']}"
            self.con.execute(f"CREATE TEMP TABLE {tbl} AS {inner}")
            self.built[rule["id"]] = f"SELECT * FROM {tbl}"
        else:
            parts = []
            for cte in rule["exports"]:
                tbl = f"oc_{rule['id']}_{cte}"
                self.con.execute(
                    f"CREATE TEMP TABLE {tbl} AS WITH {inner} SELECT * FROM {cte}"
                )
                parts.append(f"{cte} AS (SELECT * FROM {tbl})")
            self.built[rule["id"]] = ", ".join(parts)
        print(f"cache {rule['id']}: built in {time.time() - t0:.1f}s")

    def prepare(self, sql: str) -> str:
        for r in sorted(self.rules, key=lambda r: len(r["needle"])):
            if r["kind"] == "component":
                hit = ("(" + r["needle"] + ")") in sql or sql == r["needle"]
            else:
                hit = r["needle"] in sql
            if hit:
                self._ensure(r)
        return self._rewrite(sql)


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        s = df[c]
        if pd.api.types.is_datetime64_any_dtype(s):
            df[c] = s.astype("datetime64[us]").astype(str)
        elif pd.api.types.is_float_dtype(s):
            df[c] = s.round(6)
        elif s.dtype == object:
            df[c] = s.astype(str)
    return df


def value_hash(df: pd.DataFrame) -> str:
    df = normalize(df)
    if df.empty:
        return "empty"
    rows = sorted(df.astype(str).apply(lambda r: "\x1f".join(r), axis=1).tolist())
    return hashlib.md5("\x1e".join(rows).encode()).hexdigest()


def main() -> int:
    args = sys.argv[1:]
    use_cache = True
    if args and args[0] == "--no-cache":
        use_cache = False
        args = args[1:]
    sf_dir = args[0] if args else "/root/testdata/sf0.01"
    only = set(args[1:])

    sys.path.insert(0, "/root/repo")
    from topic_modeling_ajin_spark.registry import load_all
    from topic_modeling_ajin_spark.session import get_spark

    registry = load_all()
    spark = get_spark("check_oracles")

    con = duckdb.connect()
    for t in (
        "region nation customer supplier part orders lineitem events documents embeddings"
    ).split():
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )

    cache = OracleCache(con, build_cache_rules(registry)) if use_cache else None

    # Spark-side prewarm (r8 verdict task 6): the gate's long poles were
    # never DuckDB (every cache rule builds sub-second) but SESSION-COLD
    # Spark memo stacks attributed to whichever query alphabetically
    # touches them first — corpus_data_card absorbed the whole gate
    # ladder (~25-50 s) and plsa_k_sweep its per-K EM fits. Build those
    # stacks ONCE here, each timed under its own named `warm` line, so
    # every query's PASS line reports its own marginal cost and a chain
    # regression shows on the chain's line instead of hiding inside an
    # unrelated query. Full runs only — targeted runs should stay cheap
    # and time exactly what they name. Pass/fail is untouched: the warm
    # pass executes the same deterministic plans the gate then re-runs.
    if not only:
        for warm_name in (
            "corpus_data_card",          # the full gate ladder's memos
            "training_corpus_manifest_tokens",  # premix + token sampler
            "plsa_k_sweep",              # per-K sampled EM fits
            "canonical_docs",            # simhash CC chain
        ):
            spec = registry.get(warm_name)
            if spec is None:
                continue
            t0 = time.time()
            try:
                spec.fn(spark, sf_dir).write.mode("overwrite").format(
                    "noop"
                ).save()
            except Exception as e:  # noqa: BLE001 — the gate line reports it
                print(f"warm {warm_name}: failed ({e})")
                continue
            print(f"warm {warm_name}: {time.time() - t0:.1f}s")

    n_pass = n_fail = n_rows_only = 0
    for name, spec in sorted(registry.items()):
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = spec.fn(spark, sf_dir).toPandas()
        except Exception as e:  # noqa: BLE001
            print(f"FAIL  {name}: spark error: {e}")
            n_fail += 1
            continue
        if spec.sql is None:
            print(f"rows  {name}: {len(sdf)} rows (no oracle)  [{time.time()-t0:.1f}s]")
            n_rows_only += 1
            continue
        try:
            sql = cache.prepare(spec.sql) if cache is not None else spec.sql
            odf = con.execute(sql).df()
        except Exception as e:  # noqa: BLE001
            print(f"FAIL  {name}: duckdb error: {e}")
            n_fail += 1
            continue
        problems = []
        if len(sdf) != len(odf):
            problems.append(f"rows {len(sdf)} != {len(odf)}")
        if sorted(sdf.columns) != sorted(odf.columns):
            problems.append(f"cols {sorted(sdf.columns)} != {sorted(odf.columns)}")
        if not problems and value_hash(sdf) != value_hash(odf):
            problems.append("value hash mismatch")
            a, b = normalize(sdf), normalize(odf)
            a = a.sort_values(list(a.columns)).reset_index(drop=True)
            b = b.sort_values(list(b.columns)).reset_index(drop=True)
            if len(a) == len(b):
                diff = (a.astype(str) != b.astype(str)).any(axis=1)
                if diff.any():
                    i = diff.idxmax()
                    problems.append(f"first diff row {i}: spark={a.loc[i].to_dict()} oracle={b.loc[i].to_dict()}")
        if problems:
            print(f"FAIL  {name}: {'; '.join(problems)}")
            n_fail += 1
        else:
            print(f"PASS  {name}: {len(sdf)} rows  [{time.time()-t0:.1f}s]")
            n_pass += 1
    print(f"\n{n_pass} pass, {n_fail} fail, {n_rows_only} rows-only")
    return 1 if n_fail else 0


if __name__ == "__main__":
    raise SystemExit(main())
