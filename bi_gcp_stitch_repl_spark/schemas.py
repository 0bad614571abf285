"""Explicit entity schemas (schema-on-write, SURVEY.md §1.3).

The reference autodetects everything (BigQuery ``autodetect=True``) and
papers over drift with hand-maintained ``desired_order`` lists and NULL
padding; the engine declares each entity's StructType once. Shapes follow
FIXTURES.md §2 (representative payloads of the cited reference pipelines).
"""

from __future__ import annotations

from pyspark.sql import types as T


def _f(name: str, dtype, nullable: bool = True) -> T.StructField:
    return T.StructField(name, dtype, nullable)


S = T.StringType()
L = T.LongType()
D = T.DoubleType()
B = T.BooleanType()

#: Bexio invoice header + positions array (FIXTURES §2.1;
#: reference dags/bexio/bexio_invoice_and_line_items_de.py:164-234)
BEXIO_INVOICE = T.StructType(
    [
        _f("id", L, False),
        _f("contact_id", L),
        _f("kb_item_status_id", L),
        _f("document_nr", S),
        _f("is_valid_from", S),
        _f("title", S),
        _f("total_gross", S),
        _f("total_net", S),
        _f("total_taxes", S),
        _f("total", S),
        _f("mwst_type", L),
        _f("mwst_is_net", B),
        _f("contact_address", S),
        _f("updated_at", S),
        _f("taxs", T.ArrayType(T.StructType([_f("percentage", S), _f("value", S)]))),
        _f(
            "positions",
            T.ArrayType(
                T.StructType(
                    [
                        _f("id", L),
                        _f("type", S),
                        _f("amount", S),
                        _f("unit_price", S),
                        _f("position_total", S),
                        _f("tax_id", L),
                        _f("tax_value", S),
                        _f("discount_in_percent", S),
                        _f("account_id", L),
                        _f("unit_id", L),
                        _f("unit_name", S),
                        _f("text", S),
                        _f("is_optional", B),
                    ]
                )
            ),
        ),
    ]
)

#: warehouse-side key lookup for the J1 carry-forward
#: (selected_fields=["id","created_at","bexio_id"])
EXISTING_KEYS = T.StructType(
    [_f("u_id", S), _f("created_at", T.TimestampType()), _f("bexio_id", L, False)]
)

#: Billwerk contract (FIXTURES §2.4; deep struct-get with defaults + map bag)
BILLWERK_CONTRACT = T.StructType(
    [
        _f("Id", S, False),
        _f("LastBillingDate", S),
        _f("NextBillingDate", S),
        _f("PlanId", S),
        _f("CustomerId", S),
        _f("LifecycleStatus", S),
        _f("CustomerName", S),
        _f("Balance", D),
        _f("ReferenceCode", S),
        _f("Currency", S),
        _f("PlanGroupId", S),
        _f("PaymentBearer", T.StructType([_f("EmailAddress", S), _f("Type", S)])),
        _f(
            "CurrentPhase",
            T.StructType(
                [
                    _f("Type", S),
                    _f("StartDate", S),
                    _f("PlanVariantId", S),
                    _f("PlanId", S),
                    _f("Quantity", L),
                    _f("InheritStartDate", B),
                ]
            ),
        ),
        _f("StartDate", S),
        _f("BilledUntil", S),
        _f("PlanVariantId", S),
        _f("EndDate", S),
        _f("CustomFields", T.MapType(S, S)),
    ]
)

#: LexOffice voucher list row (FIXTURES §2.3; page-flag paginated)
LEXOFFICE_VOUCHER = T.StructType(
    [
        _f("id", S, False),
        _f("voucherType", S),
        _f("voucherStatus", S),
        _f("voucherNumber", S),
        _f("voucherDate", S),
        _f("contactId", S),
        _f("contactName", S),
        _f("totalAmount", S),
        _f("currency", S),
        _f("archived", B),
    ]
)

#: LexOffice invoice detail (per-key fan-out result; nested unitPrice)
LEXOFFICE_INVOICE_DETAIL = T.StructType(
    [
        _f("id", S, False),
        _f("organizationId", S),
        _f("address", T.StructType([_f("countryCode", S)])),
        _f(
            "totalPrice",
            T.StructType(
                [
                    _f("currency", S),
                    _f("totalNetAmount", D),
                    _f("totalGrossAmount", D),
                    _f("totalTaxAmount", D),
                ]
            ),
        ),
        _f(
            "lineItems",
            T.ArrayType(
                T.StructType(
                    [
                        _f("id", S),
                        _f("type", S),
                        _f("name", S),
                        _f("quantity", D),
                        _f("unitName", S),
                        _f(
                            "unitPrice",
                            T.StructType(
                                [
                                    _f("netAmount", D),
                                    _f("grossAmount", D),
                                    _f("taxRatePercentage", D),
                                ]
                            ),
                        ),
                        _f("discountPercentage", D),
                        _f("lineItemAmount", D),
                    ]
                )
            ),
        ),
        _f("_fetch_ok", B),
    ]
)

#: Stripe balance transaction (conditional-rollup input, account.py:39-76)
STRIPE_BALANCE_TXN = T.StructType(
    [
        _f("id", S, False),
        _f("account_id", S, False),
        _f("type", S),
        _f("amount", D),
        _f("created", L),  # epoch seconds
    ]
)

#: HubSpot CRM ticket with company associations (get_tickets.py:43-75).
#: The association arrives as a nested results array; the pipeline keeps
#: only the FIRST company id (the reference's r[0]['id'] extraction).
HUBSPOT_TICKET = T.StructType(
    [
        _f("id", S, False),
        _f("createdAt", S),
        _f("updatedAt", S),
        _f(
            "associations",
            T.StructType(
                [
                    _f(
                        "companies",
                        T.StructType(
                            [
                                _f(
                                    "results",
                                    T.ArrayType(
                                        T.StructType([_f("id", S), _f("type", S)])
                                    ),
                                )
                            ]
                        ),
                    )
                ]
            ),
        ),
    ]
)
