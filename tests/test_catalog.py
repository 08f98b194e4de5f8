"""S4 catalog breadth: SHOW STAGES / DIRECTORY(@stage) / setup-verification
counterparts (`app.py:108-140`, `setup_database.sql:145-168`)."""

from __future__ import annotations

from pyspark.sql import functions as F

from unstructured_data_pipeline_spark.catalog import (
    bootstrap_warehouse,
    list_stage_files,
    list_stages,
    seed_invoice_prompts,
    setup_verification,
)


def test_list_stages_union_of_dirs_and_seen(spark, tmp_path):
    (tmp_path / "stages" / "docs_stage").mkdir(parents=True)
    (tmp_path / "stages" / "img_stage").mkdir()
    tables = bootstrap_warehouse(spark, str(tmp_path / "wh"))
    # a stage only ever referenced by uploads bookkeeping (reference unions
    # SHOW STAGES with DISTINCT stage_name FROM NEW_UPLOADS)
    tables["new_uploads"].append(
        spark.createDataFrame(
            [("a.pdf", "a.pdf", "@legacy_stage", False, None)],
            tables["new_uploads"].schema,
        )
    )
    got = list_stages(spark, [str(tmp_path / "stages")], tables).collect()
    names = [r["stage_name"] for r in got]
    assert names == ["docs_stage", "img_stage", "legacy_stage"]
    roots = {r["stage_name"]: r["stage_root"] for r in got}
    assert roots["docs_stage"].endswith("/docs_stage")
    assert roots["legacy_stage"] is None


def test_list_stage_files_metadata_only(spark, tmp_path):
    stage = tmp_path / "docs_stage"
    (stage / "sub").mkdir(parents=True)
    (stage / "a.txt").write_text("alpha")
    (stage / "sub" / "b.txt").write_text("beta beta")
    df = list_stage_files(spark, str(stage))
    rows = df.collect()
    assert [r["relative_path"] for r in rows] == ["a.txt", "sub/b.txt"]
    assert [r["size_bytes"] for r in rows] == [5, 9]
    assert all(r["file_url"].startswith("file:") for r in rows)
    # the scan must NOT materialize blob contents: content column pruned
    import re as _re

    plan = df._jdf.queryExecution().executedPlan().toString()
    schemas = _re.findall(r"ReadSchema: struct<([^>]*)>", plan)
    assert schemas and all("content" not in s for s in schemas)


def test_setup_verification_counts(spark, tmp_path):
    (tmp_path / "stages" / "docs_stage").mkdir(parents=True)
    tables = bootstrap_warehouse(spark, str(tmp_path / "wh"))
    seed_invoice_prompts(spark, tables)
    got = {
        r["object_type"]: r["count"]
        for r in setup_verification(
            spark, tables, [str(tmp_path / "stages")]
        ).collect()
    }
    assert got == {
        "Tables": 5,
        "Stages": 1,
        "Document Classes": 1,
        "Prompt Rows": 1,
    }


def test_verify_table_counts_per_table(spark, tmp_path):
    from unstructured_data_pipeline_spark.catalog import verify_table_counts

    tables = bootstrap_warehouse(spark, str(tmp_path / "wh"))
    seed_invoice_prompts(spark, tables)
    rows = verify_table_counts(spark, tables).collect()
    got = {r["table_name"]: r["row_count"] for r in rows}
    # every bootstrapped table reports, names sorted, seed row visible
    assert set(got) == set(tables)
    assert [r["table_name"] for r in rows] == sorted(tables)
    assert got["class_prompts"] == 1
    assert all(v == 0 for k, v in got.items() if k != "class_prompts")
