"""§3.3 SharePoint items pipeline: lookup resolution, projection, body
text, single-chunk docs."""

from __future__ import annotations

import datetime as dt

from gpt_rag_ingestion_spark.plans.sharepoint_job import (
    resolve_lookups,
    sharepoint_attachments_to_docs,
    sharepoint_ingest_docs,
    sharepoint_items_to_docs,
)


def _items(spark):
    t = dt.datetime.fromisoformat("2024-03-01T00:00:00")
    return spark.createDataFrame(
        [
            (
                "contoso", "listA", 1,
                {"Title": "Spec", "OwnerId": "7", "Internal": "x"},
                t, '["u1","u2"]', "g1;g2",
            ),
            (
                "contoso", "listA", 2,
                {"Title": "Plan", "OwnerId": "99", "Internal": "y"},
                t, "[]", "",
            ),
        ],
        "site STRING, list_id STRING, item_id INT, fields MAP<STRING,STRING>, "
        "last_modified TIMESTAMP, user_acl_str STRING, group_acl_str STRING",
    )


def _owners(spark):
    return spark.createDataFrame(
        [("7", "Alice"), ("8", "Bob")], ["lookup_id", "lookup_value"]
    )


def test_resolve_lookups(spark):
    out = resolve_lookups(_items(spark), {"OwnerId": _owners(spark)})
    rows = {r["item_id"]: r["fields"] for r in out.collect()}
    assert rows[1]["OwnerId"] == "Alice"  # resolved
    assert rows[2]["OwnerId"] == "99"  # missing dim row -> raw id kept


def test_sharepoint_items_to_docs(spark):
    docs = sharepoint_items_to_docs(
        _items(spark),
        lookups={"OwnerId": _owners(spark)},
        exclude_fields=["Internal"],
        embedding_dim=8,
    ).collect()
    by_parent = {r["parent_id"]: r for r in docs}
    d1 = by_parent["contoso-listA-1"]
    assert d1["id"] == "contoso-listA-1-c00000"
    assert "OwnerId: Alice" in d1["content"]
    assert "Internal" not in d1["content"]
    assert d1["metadata_security_user_ids"] == ["u1", "u2"]
    assert d1["metadata_security_group_ids"] == ["g1", "g2"]
    assert d1["source"] == "sharepoint-list"
    assert len(d1["contentVector"]) == 8


def _attachments(spark):
    t = dt.datetime.fromisoformat("2024-03-02T00:00:00")
    pdf_payload = (
        b"intro words for page one here. " * 8
        + b"<!-- PageBreak --> "
        + b"second page words here. " * 8
    )
    return spark.createDataFrame(
        [
            ("contoso", "listA", 1, "spec.pdf", pdf_payload, t,
             "https://contoso/spec.pdf", '["u1"]', "finance"),
            ("contoso", "listA", 2, "tool.exe", b"\x00\x01", t,
             "https://contoso/tool.exe", "[]", ""),
        ],
        "site STRING, list_id STRING, item_id INT, file_name STRING, "
        "payload BINARY, last_modified TIMESTAMP, web_url STRING, "
        "user_acl_str STRING, category STRING",
    )


def test_sharepoint_attachments_to_docs(spark):
    """Document-library path (reference sharepoint_indexer.py:969-1074):
    allow-list filter, full chunk pipeline, attachment-doc mapping."""
    docs = sharepoint_attachments_to_docs(
        _attachments(spark), embedding_dim=8, max_tokens=40, overlap=4,
        min_tokens=1,
    ).collect()
    # the .exe never passes the extension allow-list
    assert docs and all("tool-exe" not in r["parent_id"] for r in docs)
    first = sorted(docs, key=lambda r: r["chunk_id"])[0]
    assert first["parent_id"] == "contoso-listA-1-spec-pdf"
    assert first["id"] == "contoso-listA-1-spec-pdf-c00000"
    assert first["metadata_storage_name"] == "spec.pdf"
    assert first["metadata_storage_path"] == first["parent_id"]
    assert first["filepath"] == ""  # reference :965
    assert first["url"] == "https://contoso/spec.pdf"
    assert first["category"] == "finance"
    assert first["metadata_security_user_ids"] == ["u1"]
    assert first["source"] == "sharepoint-list"
    # the pdf stand-in crossed a PageBreak: page attribution present
    assert {r["page"] for r in docs} == {1, 2}
    assert len(first["contentVector"]) == 8


def test_sharepoint_ingest_union(spark):
    """Bodies + attachments land in ONE relation under one schema."""
    out = sharepoint_ingest_docs(
        _items(spark),
        attachments=_attachments(spark),
        exclude_fields=["Internal"],
        embedding_dim=8,
    )
    rows = out.collect()
    parents = {r["parent_id"] for r in rows}
    assert "contoso-listA-1" in parents  # body doc
    assert "contoso-listA-1-spec-pdf" in parents  # attachment chunks
    assert {r["source"] for r in rows} == {"sharepoint-list"}
    # single schema across both branches
    assert len({tuple(sorted(r.asDict().keys())) for r in rows}) == 1


def test_parse_site_configs(spark):
    """S8 hydration: the relational twin of _parse_collections
    (reference sharepoint_indexer.py:275-368) including its validation
    rules."""
    import json

    from gpt_rag_ingestion_spark.plans.sharepoint_job import parse_site_configs

    docs = [
        {  # valid: one generic list + one document library
            "type": "sharepoint_site",
            "siteDomain": " contoso.sharepoint.com ",
            "siteName": "eng",
            "category": "engineering",
            "lists": [
                {
                    "listId": "listA",
                    "includeFields": [" Title ", "OwnerId", "Title", ""],
                    "excludeFields": ["Internal"],
                    "filter": "fields/Modified gt '2024-01-01'",
                },
                {
                    "listId": "libB",
                    "listType": "Document_Library",
                    "category": "specs",
                },
                {"listType": "generic_list"},  # no listId/listName: dropped
                {"listName": "Legacy", "listType": "bogus_type"},
            ],
        },
        {"type": "sharepoint_site", "siteName": "x", "lists": []},  # no domain
        {"type": "other_thing", "siteDomain": "d", "siteName": "n", "lists": []},
        {"type": "sharepoint_site", "siteDomain": "d", "siteName": "n"},  # no lists
    ]
    cfg = spark.createDataFrame([(json.dumps(d),) for d in docs], ["doc"])
    rows = {
        (r["list_id"], r["list_name"]): r
        for r in parse_site_configs(cfg).collect()
    }
    assert set(rows) == {("listA", None), ("libB", None), (None, "Legacy")}
    a = rows[("listA", None)]
    assert a["site"] == "contoso.sharepoint.com/eng"
    assert a["include_fields"] == ["Title", "OwnerId"]  # trim+dedup, order kept
    assert a["exclude_fields"] == ["Internal"]
    assert a["category"] == "engineering"  # site-level fallback
    assert a["list_type"] == "generic_list"
    assert a["filter"] == "fields/Modified gt '2024-01-01'"
    b = rows[("libB", None)]
    assert b["list_type"] == "document_library"  # case-insensitive
    assert b["category"] == "specs"  # list-level wins
    assert b["include_fields"] is None and b["exclude_fields"] == []
    legacy = rows[(None, "Legacy")]
    assert legacy["list_type"] == "generic_list"  # invalid type defaults


def test_sharepoint_ingest_from_config(spark):
    """S8 composed: a two-collection config drives bodies + attachments
    in one plan; unconfigured lists never ingest; include projection
    and config category land on the docs."""
    import json

    from gpt_rag_ingestion_spark.plans.sharepoint_job import (
        sharepoint_ingest_from_config,
    )

    cfg = spark.createDataFrame(
        [(json.dumps({
            "type": "sharepoint_site",
            "siteDomain": "contoso.sharepoint.com",
            "siteName": "eng",
            "category": "engineering",
            "lists": [
                {"listId": "listA", "includeFields": ["Title", "OwnerId"]},
                {"listId": "libB", "listType": "document_library",
                 "category": "specs"},
            ],
        }),)],
        ["doc"],
    )
    t = dt.datetime.fromisoformat("2024-03-01T00:00:00")
    site = "contoso.sharepoint.com/eng"
    items = spark.createDataFrame(
        [
            (site, "listA", 1,
             {"Title": "Spec", "OwnerId": "7", "Internal": "x"},
             t, '["u1"]', "g1"),
            (site, "unconfigured", 2, {"Title": "Nope"}, t, "[]", ""),
        ],
        "site STRING, list_id STRING, item_id INT, fields MAP<STRING,STRING>, "
        "last_modified TIMESTAMP, user_acl_str STRING, group_acl_str STRING",
    )
    attachments = spark.createDataFrame(
        [
            (site, "libB", 9, "doc.pdf", b"words here. " * 30, t),
            (site, "listA", 1, "skip.pdf", b"body attachment", t),
        ],
        "site STRING, list_id STRING, item_id INT, file_name STRING, "
        "payload BINARY, last_modified TIMESTAMP",
    )
    rows = sharepoint_ingest_from_config(
        cfg, items, attachments=attachments,
        lookups={"OwnerId": _owners(spark)}, embedding_dim=8,
    ).collect()
    parents = {r["parent_id"] for r in rows}
    # configured generic list -> body doc; configured library -> chunks;
    # unconfigured list / non-library attachment -> absent
    body = [r for r in rows if r["parent_id"].startswith("contoso-sharepoint-com-eng-listA-1")]
    att = [r for r in rows if "libB-9-doc-pdf" in r["parent_id"]]
    assert body and att
    assert not any("unconfigured" in p for p in parents)
    assert not any("skip-pdf" in p for p in parents)
    d1 = body[0]
    assert "OwnerId: Alice" in d1["content"]  # lookup resolved
    assert "Internal" not in d1["content"]  # include projection applied
    assert d1["category"] == "engineering"  # site-level category
    assert att[0]["category"] == "specs"  # list-level category


def test_config_listname_resolution_and_fail_loud(spark):
    """Review finding: listName-only config rows must resolve via
    list_name_dim or raise — never silently ingest nothing."""
    import json

    import pytest

    from gpt_rag_ingestion_spark.plans.sharepoint_job import (
        sharepoint_ingest_from_config,
    )

    cfg = spark.createDataFrame(
        [(json.dumps({
            "type": "sharepoint_site", "siteDomain": "c", "siteName": "e",
            "lists": [{"listName": "Tasks"}],
        }),)],
        ["doc"],
    )
    t = dt.datetime.fromisoformat("2024-03-01T00:00:00")
    items = spark.createDataFrame(
        [("c/e", "L9", 1, {"Title": "Spec"}, t)],
        "site STRING, list_id STRING, item_id INT, "
        "fields MAP<STRING,STRING>, last_modified TIMESTAMP",
    )
    with pytest.raises(ValueError, match="listName"):
        sharepoint_ingest_from_config(cfg, items, embedding_dim=8).collect()

    dim = spark.createDataFrame(
        [("c/e", "Tasks", "L9")], "site STRING, list_name STRING, list_id STRING"
    )
    rows = sharepoint_ingest_from_config(
        cfg, items, embedding_dim=8, list_name_dim=dim
    ).collect()
    assert len(rows) == 1 and rows[0]["parent_id"] == "c-e-L9-1"


def test_config_empty_include_falls_through_to_exclude(spark):
    """Review finding: includeFields that cleans to [] must NOT mean
    'keep nothing' — it falls through to excludeFields (reference
    precedence)."""
    import json

    from gpt_rag_ingestion_spark.plans.sharepoint_job import (
        sharepoint_ingest_from_config,
    )

    cfg = spark.createDataFrame(
        [(json.dumps({
            "type": "sharepoint_site", "siteDomain": "c", "siteName": "e",
            "lists": [{"listId": "L1", "includeFields": ["", "  "],
                       "excludeFields": ["Secret"]}],
        }),)],
        ["doc"],
    )
    t = dt.datetime.fromisoformat("2024-03-01T00:00:00")
    items = spark.createDataFrame(
        [("c/e", "L1", 1, {"Title": "Spec", "Secret": "x"}, t)],
        "site STRING, list_id STRING, item_id INT, "
        "fields MAP<STRING,STRING>, last_modified TIMESTAMP",
    )
    rows = sharepoint_ingest_from_config(cfg, items, embedding_dim=8).collect()
    assert len(rows) == 1
    assert "Title: Spec" in rows[0]["content"]
    assert "Secret" not in rows[0]["content"]


def test_config_scan_composes_with_hydration(spark, tmp_path):
    """S8 end-to-end: sources.read_site_configs (structured JSON scan)
    feeds parse_site_configs directly — no manual re-serialization."""
    import json

    from gpt_rag_ingestion_spark.plans.sharepoint_job import parse_site_configs
    from gpt_rag_ingestion_spark.sources.binary_docs import read_site_configs

    cfgdir = tmp_path / "configs"
    cfgdir.mkdir()
    (cfgdir / "a.json").write_text(json.dumps({
        "type": "sharepoint_site", "siteDomain": "contoso", "siteName": "eng",
        "lists": [{"listId": "L1", "excludeFields": ["Internal"]}],
    }))
    (cfgdir / "b.json").write_text(json.dumps({
        "type": "sql_endpoint", "id": "other-datasource"
    }))
    raw = read_site_configs(spark, str(cfgdir))
    rows = parse_site_configs(raw).collect()
    assert len(rows) == 1
    assert rows[0]["site"] == "contoso/eng"
    assert rows[0]["list_id"] == "L1"
    assert rows[0]["exclude_fields"] == ["Internal"]


def test_landing_zone_contracts(spark):
    """The crawler handshake (LANDING_ZONE.md): the engine's own
    fixtures satisfy the machine-readable contracts, extra columns are
    allowed, and violations fail fast with a per-column diff."""
    import pytest

    from gpt_rag_ingestion_spark.sources.contracts import (
        assert_landing_schema,
    )

    # _items carries extra ACL columns -> still passes (extras allowed)
    assert_landing_schema(_items(spark), "sharepoint_items")
    t = dt.datetime.fromisoformat("2024-03-01T00:00:00")
    atts = spark.createDataFrame(
        [("contoso", "libB", 9, "doc.pdf", b"x", t)],
        "site STRING, list_id STRING, item_id INT, file_name STRING, "
        "payload BINARY, last_modified TIMESTAMP",
    )
    assert_landing_schema(atts, "sharepoint_attachments")
    assert_landing_schema(
        spark.createDataFrame([('{"type":"sharepoint_site"}',)], ["doc"]),
        "site_configs",
    )
    assert_landing_schema(
        spark.createDataFrame(
            [(1, "https://a.example/x", "text")],
            "doc_id LONG, url STRING, text STRING",
        ),
        "web_crawl",
    )

    # violation: payload typed string, file_name missing
    broken = spark.createDataFrame(
        [("contoso", "libB", 9, "not-bytes", t)],
        "site STRING, list_id STRING, item_id INT, payload STRING, "
        "last_modified TIMESTAMP",
    )
    with pytest.raises(ValueError) as e:
        assert_landing_schema(broken, "sharepoint_attachments")
    msg = str(e.value)
    assert "file_name" in msg and "payload" in msg and "binary" in msg
    with pytest.raises(ValueError):
        assert_landing_schema(atts, "no_such_family")


def test_duplicate_config_docs_dedupe_and_conflict(spark):
    """Advisor finding (r3): a collection configured in TWO config docs
    must ingest once (identical specs collapse); CONFLICTING specs for
    the same (site, list) raise instead of silently double-ingesting."""
    import json

    import pytest

    from gpt_rag_ingestion_spark.plans.sharepoint_job import (
        sharepoint_ingest_from_config,
    )

    def cfg_doc(include):
        return json.dumps({
            "type": "sharepoint_site",
            "siteDomain": "contoso", "siteName": "eng",
            "lists": [{"listId": "listA", "includeFields": include}],
        })

    t = dt.datetime.fromisoformat("2024-03-01T00:00:00")
    items = spark.createDataFrame(
        [("contoso/eng", "listA", 1, {"Title": "Spec"}, t)],
        "site STRING, list_id STRING, item_id INT, "
        "fields MAP<STRING,STRING>, last_modified TIMESTAMP",
    )
    # same spec twice -> one body doc, not two
    twice = spark.createDataFrame(
        [(cfg_doc(["Title"]),), (cfg_doc(["Title"]),)], ["doc"]
    )
    rows = sharepoint_ingest_from_config(twice, items, embedding_dim=8).collect()
    assert len(rows) == 1

    # conflicting include sets -> loud failure naming the collection
    conflict = spark.createDataFrame(
        [(cfg_doc(["Title"]),), (cfg_doc(["Title", "Owner"]),)], ["doc"]
    )
    with pytest.raises(ValueError) as e:
        sharepoint_ingest_from_config(conflict, items, embedding_dim=8)
    assert "listA" in str(e.value)
