"""Executor-side transport factory for the rest DataSource tests (must be
importable by module path — transports are constructed on executors)."""

from __future__ import annotations

TOTAL = 1234


def make_transport():
    def transport(url, params):
        lo, limit = params["offset"], params["limit"]
        return [
            {"id": i, "amount": i * 0.5}
            for i in range(lo, min(lo + limit, TOTAL))
        ]

    return transport


def make_keyset_transport(path):
    """Keyset-protocol transport over the JSON file at ``path`` — the
    mutable 'upstream API table' for streaming tests (append rows to the
    file between micro-batches)."""
    import json

    def transport(url, params):
        with open(path) as f:
            rows = sorted(json.load(f), key=lambda r: r["Id"])
        start = params.get("from")
        if start is not None:
            rows = [r for r in rows if r["Id"] >= start]  # cursor row re-included
        return rows[: params["take"]]

    return transport


def make_billwerk_customer_transport():
    """Factory for the CLI $transport resolver test: a tiny keyset
    'customers' API (jobs/entities.py billwerk_customers entity)."""
    rows = [
        {
            "Id": f"c{i}",
            "CustomerName": f"Cust {i}",
            "Address": {"Street": "Main", "HouseNumber": str(i)},
            "Hidden": False,
        }
        for i in range(3)
    ]

    def transport(url, params):
        data = sorted(rows, key=lambda r: r["Id"])
        start = params.get("from")
        if start is not None:
            data = [r for r in data if r["Id"] >= start]
        return data[: params["take"]]

    return transport


def make_cease_date_sheet_transport():
    """Factory for the CLI $transport resolver: the billwerk cease-date
    admin sheet (jobs/entities.py BILLWERK_CEASE_DATE) — a well-formed
    date, an empty cell and a malformed cell, so the CLI smoke covers
    the typed-parse NULL coercions end to end."""
    values = [
        ["No", "customer_id", "admin_cease_date", "Note", "extra_col"],
        ["1", "cu1", "2026-03-31", "churn", "ignored"],
        ["2", "cu2", "", "no date yet", "ignored"],
        ["3", "cu3", "not-a-date", "typo'd cell", "ignored"],
    ]

    def transport(url, params):
        return {"values": values}

    return transport
