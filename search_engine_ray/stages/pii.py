"""PII detection and redaction over a text column.

Standard training-data hygiene pass (north-rule addition; the reference
engine has no equivalent): count and mask emails, IPv4 addresses and
NANP-style phone numbers.  Everything runs through pyarrow.compute's RE2
kernels (``count_substring_regex`` / ``replace_substring_regex``) — fully
vectorized, zero Python per row, and bit-identical to a DuckDB oracle
because DuckDB's regexp functions are the same RE2 engine.

Redaction order is part of the contract (applied to the ORIGINAL text for
counts, then chained for the redacted text): EMAIL -> IP -> PHONE.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray.data

EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
IPV4_RE = r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b"
PHONE_RE = r"\b\d{3}[-.]\d{3}[-.]\d{4}\b"

EMAIL_TAG = "<EMAIL>"
IPV4_TAG = "<IP>"
PHONE_TAG = "<PHONE>"


def _scan_redact_batch(batch: pa.Table, *, text_col: str) -> pa.Table:
    t = batch.column(text_col)
    if t.type != pa.string():
        t = t.cast(pa.string())
    email_n = pc.count_substring_regex(t, EMAIL_RE).cast(pa.int64())
    ip_n = pc.count_substring_regex(t, IPV4_RE).cast(pa.int64())
    phone_n = pc.count_substring_regex(t, PHONE_RE).cast(pa.int64())
    red = pc.replace_substring_regex(t, EMAIL_RE, EMAIL_TAG)
    red = pc.replace_substring_regex(red, IPV4_RE, IPV4_TAG)
    red = pc.replace_substring_regex(red, PHONE_RE, PHONE_TAG)
    return pa.table({
        "doc_id": batch.column("doc_id"),
        "email_count": email_n,
        "ip_count": ip_n,
        "phone_count": phone_n,
        "redacted": red,
    })


def pii_scan_redact(docs: "ray.data.Dataset", *, text_col: str = "text"
                    ) -> "ray.data.Dataset":
    """(doc_id, email_count, ip_count, phone_count, redacted) per doc.

    Pure per-batch map — no shuffle, streams at any scale; the RE2 kernels
    run inside Arrow so large text columns never materialize as Python
    strings."""
    from functools import partial
    return docs.select_columns(["doc_id", text_col]).map_batches(
        partial(_scan_redact_batch, text_col=text_col),
        batch_format="pyarrow")


def inject_synthetic_pii(docs: "ray.data.Dataset") -> "ray.data.Dataset":
    """Deterministically append synthetic PII to a doc_id-keyed subset —
    the oracle-mirrorable fixture for exercising ``pii_scan_redact`` (the
    raw synthetic corpus contains no PII, and a 0-hit entry would leave the
    scan untested; same reasoning as ``embedding_near_dups_aug``).

    doc_id % 7 == 0  -> " contact user<id>@example.com"
    doc_id % 11 == 0 -> " from 10.<id%256>.0.<id%100>"
    doc_id % 13 == 0 -> " call 555-<100+id%900>-<1000+id%9000>"
    """

    def fn(b: pa.Table) -> pa.Table:
        ids = b.column("doc_id").to_numpy(zero_copy_only=False).astype(
            np.int64)
        s_id = pc.cast(pa.array(ids), pa.string())
        email = pc.binary_join_element_wise(
            " contact user", s_id, "@example.com", "")
        ip = pc.binary_join_element_wise(
            " from 10.", pc.cast(pa.array(ids % 256), pa.string()),
            ".0.", pc.cast(pa.array(ids % 100), pa.string()), "")
        phone = pc.binary_join_element_wise(
            " call 555-", pc.cast(pa.array(100 + ids % 900), pa.string()),
            "-", pc.cast(pa.array(1000 + ids % 9000), pa.string()), "")
        empty = pa.scalar("", pa.string())
        text = pc.binary_join_element_wise(
            b.column("text").cast(pa.string()),
            pc.if_else(pa.array(ids % 7 == 0), email, empty),
            pc.if_else(pa.array(ids % 11 == 0), ip, empty),
            pc.if_else(pa.array(ids % 13 == 0), phone, empty),
            "")
        return pa.table({"doc_id": b.column("doc_id"), "text": text})

    return docs.select_columns(["doc_id", "text"]).map_batches(
        fn, batch_format="pyarrow")
