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
