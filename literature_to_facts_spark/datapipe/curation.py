"""The composed training-data curation pipeline — the artifact the datapipe
operators exist for, chained end to end:

    quality gate  ->  near-dup purge (MinHash-LSH pairs -> CC -> keep reps)
                  ->  deterministic mixture sample

Composition is where contract drift between stages hides (column renames,
id-type mismatches, a filter applied to the wrong side of the purge), so the
chain ships as ONE operator with ONE composed DuckDB oracle
(q: curation_pipeline — the gated-CTE, pair-generation, recursive-closure
and hash-threshold SQL fragments nested into a single statement).

Plan shape (pinned by tests/test_datapipe.py::test_curation_pipeline_plan):
the quality gate is pure per-row expressions and FUSES into the scans that
feed both the pair pipeline and the purge; the mixture-sample hash filter is
likewise narrow and Catalyst pushes it THROUGH the purge's left-anti join
onto the scan side — so sampling adds ZERO Exchanges, and at a 10% mixture
the anti-join shuffles 10x fewer kept-side rows.  The only shuffles in the
whole chain are the ones pairing + closure inherently need.

Scale note: the gated frame feeds two consumers (pair generation and the
purge's left side), so its narrow filter expressions run twice — at 100 TB
that is the right trade (two scan-fused passes) versus materializing a
mostly-full copy of the corpus between stages.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from literature_to_facts_spark.datapipe.dedup import (
    deduplicate_corpus,
    minhash_lsh_pairs,
)
from literature_to_facts_spark.datapipe.sampling import sample_fraction_by_group
from literature_to_facts_spark.datapipe.textstats import (
    QUALITY_GATE_COLS,
    quality_filter,
)


def curate_corpus(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    group_col: str = "lang",
    fractions: dict | None = None,
    default_fraction: float = 0.0,
    quality_params: dict | None = None,
    minhash_params: dict | None = None,
    max_iters: int = 25,
    eval_docs: DataFrame | None = None,
    decontam_params: dict | None = None,
    token_budgets: dict | None = None,
    budget_weight_col: str = "n_ws_tokens",
    cache_registry: list | None = None,
    line_dedup_params: dict | None = None,
    pii: bool = False,
) -> DataFrame:
    """[line_dedup ->] [pii_redact ->] quality_filter(keep)
    [-> decontaminate vs ``eval_docs``]
    -> minhash_lsh_pairs -> deduplicate_corpus
    -> sample_fraction_by_group OR sample_to_token_budget,
    with every stage's parameters passed through.

    ``line_dedup_params`` (a dict, may be empty) enables cross-document
    line dedup as the FIRST stage — boilerplate removal changes the quality
    ratios and the MinHash signatures, so it must precede both; non-text
    columns ride through the reassembly as first() aggregates (zero extra
    shuffle).  ``pii=True`` masks emails/IPs/phones in place next — before
    the gate, so the masks (not the raw PII) are what quality scoring and
    near-dup hashing see, and the shipped sample is redacted.

    Two line-dedup caveats: (1) NULL-text documents are DROPPED when the
    stage is enabled (line_dedup's contract — there is nothing to clean),
    whereas the base chain lets them through the gate and the purge; a
    corpus that ships NULL-text rows deliberately must filter or fill them
    first.  (2) ``token_budgets`` weights charge whatever
    ``budget_weight_col`` the input carries — token counts computed BEFORE
    cleaning overcharge boilerplate-heavy docs against their group budget;
    recompute counts on the cleaned text (run ``with_token_counts`` after
    this function, or pre-clean separately) when budgets must reflect
    shipped token mass.

    ``eval_docs`` adds the decontamination stage (params via
    ``decontam_params``) between the gate and the purge — contaminated docs
    must not even participate in near-dup clustering, or a purged cluster
    could keep a contaminated representative over a clean member.
    ``token_budgets`` selects the token-budget mixture sampler instead of
    ``fractions`` (mutually exclusive; ``budget_weight_col`` must exist on
    ``docs``, e.g. from ``with_token_counts``).  ``fractions=None`` and
    ``token_budgets=None`` skip sampling (gate [+ decontam] + purge only).
    EAGER (the purge embeds the connected-components fixpoint).  Returns
    the surviving rows with the input's columns.
    """
    if fractions is not None and token_budgets is not None:
        raise ValueError("pass fractions OR token_budgets, not both")
    quality_params = quality_params or {}
    minhash_params = minhash_params or {}
    # same loud-failure contract as the line_dedup / pii stages: an input
    # column named like a gate output (e.g. 'keep') would be silently
    # replaced by quality_filter and re-emitted with gate values via
    # select(*docs.columns)
    clash = sorted(QUALITY_GATE_COLS & {c for c in docs.columns if c != text_col})
    if clash:
        raise ValueError(
            f"input columns {clash} collide with quality_filter's outputs; "
            "rename them before calling curate_corpus"
        )
    if line_dedup_params is not None:
        from literature_to_facts_spark.datapipe.textclean import (
            _RESERVED_LINE_COLS,
            line_dedup,
        )

        # carry every non-text column through the reassembly aggregate
        # (constant per doc) — reattaching via a join-by-id would cost a
        # corpus-wide Exchange for nothing.  Names that collide with the
        # reassembly's own outputs/internals fail loudly with pipeline-
        # specific guidance (the SAME set line_dedup itself guards —
        # imported, so the two checks cannot drift).
        carry = tuple(c for c in docs.columns if c not in (id_col, text_col))
        clash = sorted(_RESERVED_LINE_COLS & set(carry))
        if clash:
            raise ValueError(
                f"input columns {clash} collide with line_dedup's output; "
                "rename them before enabling line_dedup_params"
            )
        docs = line_dedup(
            docs, id_col=id_col, text_col=text_col, carry_cols=carry,
            **line_dedup_params,
        ).select(
            F.col(id_col), F.col("clean_text").alias(text_col),
            *[F.col(c) for c in carry],
        )
    if pii:
        from literature_to_facts_spark.datapipe.textclean import (
            PII_PATTERNS,
            pii_redact,
        )

        pii_cols = {f"n_{name}" for name, _, _ in PII_PATTERNS} | {"has_pii"}
        clash = sorted(pii_cols & set(docs.columns))
        if clash:
            raise ValueError(
                f"input columns {clash} collide with pii_redact's outputs "
                "(they would be replaced then dropped); rename them before "
                "enabling pii=True"
            )
        docs = pii_redact(
            docs, id_col=id_col, text_col=text_col, output_col=text_col
        ).drop(*[f"n_{name}" for name, _, _ in PII_PATTERNS], "has_pii")
    gated = quality_filter(docs, text_col=text_col, **quality_params)
    kept = gated.where(F.col("keep")).select(*docs.columns)
    if eval_docs is not None:
        from literature_to_facts_spark.datapipe.decontam import contamination_pairs

        # the gated `kept` frame feeds TWO consumers below (pair generation
        # and the purge's left side) — acceptable for the narrow quality
        # gate, but the decontamination subtree (corpus-wide gram explode +
        # join) must not run twice: persist the FLAGGED ID SET (tiny —
        # contamination-sized, not corpus-sized) so both consumers replay
        # only gate + a broadcast-able anti join.  The operator is EAGER
        # (the purge's CC fixpoint), so the persist populates on first use;
        # pass cache_registry to release it.
        bad = (
            contamination_pairs(
                kept, eval_docs, id_col=id_col, text_col=text_col,
                **(decontam_params or {}),
            )
            .select(F.col("doc_id").alias(id_col))
            .distinct()
            .persist()
        )
        if cache_registry is not None:
            cache_registry.append(bad)
        kept = kept.join(bad, on=id_col, how="left_anti")
    pairs = minhash_lsh_pairs(
        kept, id_col=id_col, text_col=text_col, **minhash_params
    )
    purged = deduplicate_corpus(kept, pairs, id_col=id_col, max_iters=max_iters)
    if token_budgets is not None:
        from literature_to_facts_spark.datapipe.sampling import (
            sample_to_token_budget,
        )

        return sample_to_token_budget(
            purged,
            token_budgets,
            group_col=group_col,
            id_col=id_col,
            weight_col=budget_weight_col,
        )
    if fractions is None:
        return purged
    return sample_fraction_by_group(
        purged,
        fractions,
        group_col=group_col,
        id_col=id_col,
        default_fraction=default_fraction,
    )
