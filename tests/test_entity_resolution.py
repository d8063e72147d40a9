"""Behavioral pins for the round-8 entity-resolution cascade
(score-sampled / EM fit / transitive closure) — properties the
value-hash oracles can't express: score-scale transfer, EM moving off
its priors in the right direction, and closure transitivity."""

from pyspark.sql import functions as F

SF = "/root/testdata/sf0.01"


def test_sampled_scores_on_full_scale(spark):
    """A pair that survives the name sample must score IDENTICALLY in
    the sampled and full forms — u and attributes stay full-corpus by
    design, so thresholds tuned on the sample transfer unchanged."""
    from firebase_realtime_database_backup_spark.operators.dedup import (
        dedup_entity_resolution,
        dedup_entity_resolution_sampled,
    )

    full = {
        (r.name_a, r.name_b): r.match_score
        for r in dedup_entity_resolution(spark, SF).collect()
    }
    sampled = dedup_entity_resolution_sampled(spark, SF).collect()
    assert sampled, "sample kept no pairs — MOD too coarse for this corpus"
    for r in sampled:
        assert full[(r.name_a, r.name_b)] == r.match_score, (
            r.name_a,
            r.name_b,
        )


def test_em_fit_moves_off_priors_sanely(spark):
    """EM invariants on the base corpus: a proper probability fit
    (all params in (0,1)), the match class agreeing MORE than the
    non-match class on each field (m_f > u_f — the separation that
    makes the log-LR weights positive evidence), and the posterior
    ordered by agreement count."""
    from firebase_realtime_database_backup_spark.operators.dedup import (
        dedup_entity_resolution_em,
    )

    rows = dedup_entity_resolution_em(spark, SF).collect()
    assert rows
    p = rows[0]
    for f in ("em_p", "em_m_nation", "em_m_segment",
              "em_u_nation", "em_u_segment"):
        v = getattr(p, f)
        assert v is not None and 0.0 < v < 1.0, (f, v)
        # fitted params are identical on every output row
        assert all(getattr(r, f) == v for r in rows)
    assert p.em_m_nation > p.em_u_nation
    assert p.em_m_segment > p.em_u_segment
    w = {(r.agree_nation, r.agree_segment): r.w_match for r in rows}
    if (1, 1) in w and (0, 0) in w:
        assert w[(1, 1)] > w[(0, 0)]
    if (1, 1) in w and (1, 0) in w:
        assert w[(1, 1)] >= w[(1, 0)]


def test_entity_clusters_are_transitive_and_labeled_min(spark):
    """Every scored pair above the threshold must land in ONE entity;
    each entity_id must be the lexicographic min of its members; and
    n_members must equal the actual member count."""
    from firebase_realtime_database_backup_spark.operators.dedup import (
        ER_CLUSTER_THRESHOLD,
        dedup_entity_clusters,
        dedup_entity_resolution,
    )

    comp = {
        r.name: (r.entity_id, r.n_members)
        for r in dedup_entity_clusters(spark, SF).collect()
    }
    assert comp
    pairs = (
        dedup_entity_resolution(spark, SF)
        .filter(F.col("match_score") > ER_CLUSTER_THRESHOLD)
        .collect()
    )
    assert pairs, "no pairs above threshold — pin corpus drifted"
    for r in pairs:
        assert comp[r.name_a][0] == comp[r.name_b][0], (r.name_a, r.name_b)
    by_entity = {}
    for name, (eid, _) in comp.items():
        by_entity.setdefault(eid, []).append(name)
    for eid, members in by_entity.items():
        assert eid == min(members)
        assert all(comp[m][1] == len(members) for m in members)
