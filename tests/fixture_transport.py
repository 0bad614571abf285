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
