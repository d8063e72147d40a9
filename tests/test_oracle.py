"""Full registry ↔ DuckDB oracle gate at sf0.001 (fast local replica of
the driver's CORRECTNESS check; the driver runs sf0.01)."""

from firebase_realtime_database_backup_spark import verify


def test_all_queries_match_oracle(spark):
    results = verify.run_all(spark, "/root/testdata/sf0.001")
    failures = [r for r in results if not r.ok]
    assert not failures, [f"{r.name}: {r.details}" for r in failures]
    assert len(results) >= 45


def test_entry_smoke(spark):
    import __spark_entry__ as entrymod

    df = entrymod.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    assert {"r_name", "l_returnflag", "revenue", "n_items"} == set(df.columns)


def test_oracle_outputs_canon_safe(spark):
    """Registry lint: no oracle output column may be HUGEINT or nested.

    The driver canonicalizes via pandas (``fetchdf``): HUGEINT becomes
    float64 (hash mismatch vs Spark bigint — the round-2
    text_pack_sequences FAIL) and list/struct/map cells crash
    ``sort_values`` (the round-2 text_inverted_index ERR).  This lint
    kills the CLASS, not the instance."""
    import __spark_entry__ as entrymod

    con = verify.duckdb_connection("/root/testdata/sf0.001")
    problems = verify.lint_oracle_output_types(con, entrymod.oracle_sql())
    assert not problems, problems


def test_spark_outputs_canon_safe(spark):
    """Registry lint: oracle-backed Spark queries return scalars only."""
    import __spark_entry__ as entrymod

    problems = verify.lint_spark_output_types(
        spark, entrymod.queries(), entrymod.oracle_sql(), "/root/testdata/sf0.001"
    )
    assert not problems, problems


def test_driver_passed_names_exist(spark):
    """Rotation-contract lint: every name in DRIVER_PASSED must be a
    registered query.  A typo'd or since-renamed name would silently
    send the real query back to the never-attested tier (or match
    nothing), wasting the driver's capped attestation window on
    re-proving already-passed queries."""
    import __spark_entry__ as entrymod

    from firebase_realtime_database_backup_spark.registry import DRIVER_PASSED

    unknown = DRIVER_PASSED - set(entrymod.queries())
    assert not unknown, f"DRIVER_PASSED names not in registry: {sorted(unknown)}"


def test_every_oracle_has_query(spark):
    import __spark_entry__ as entrymod

    q, o = entrymod.queries(), entrymod.oracle_sql()
    assert set(o) <= set(q)
    assert len(q) >= 45
