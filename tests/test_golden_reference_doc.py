"""Reproduce the reference's ACTUAL golden document.

Inputs are derived from /root/reference/PMT_KAL_5776815_1.json (the
reference's published output for one payment aggregate); the pipeline
must regenerate every field and every nested element of that document
value-for-value. This is the strongest parity evidence available — the
reference's own data, not synthetic approximations.

Notes on the comparison:
- the golden JSON drops null struct fields (pmt_premium_edm_number,
  pmt_prd_premium_channel_detail) — we canonicalize the same way;
- golden numbers are JSON ints/floats where the engine emits
  Decimal(18,2) — compared numerically;
- the golden 'id' hash was produced by an external system with an
  unknown canonicalization, so it is excluded (our content-hash ids
  are deterministic but differently derived — see nest.doc_id).
"""

from __future__ import annotations

import json
from decimal import Decimal

import pytest

from ods_to_datalake_spark.plans.ordinary_payment import (
    PaymentRunParams,
    build_payment_documents,
)

GOLDEN_PATH = "/root/reference/PMT_KAL_5776815_1.json"

PAYMENT_COLS = (
    "pmt_seq string, pol_no string, pol_year string, pmt_premium_type string,"
    " pmt_type string, prm_mode string, pmt_prm_term_year string,"
    " pmt_prd_seq string, trx_dt string, next_due_dt string, cbr_dt string,"
    " sub_dt string, receipt_no string, pmt_prd_outstanding string,"
    " trx_amount string, il_sp_prm string, tpl_sp_prm string,"
    " pmt_method string, pmt_channel string"
)


def _canon(value):
    """Golden-JSON canonical form: drop nulls, numbers to float."""
    if isinstance(value, dict):
        return {
            k: _canon(v) for k, v in value.items() if v is not None
        }
    if isinstance(value, list):
        return [_canon(v) for v in value]
    if isinstance(value, Decimal):
        return float(value)
    if isinstance(value, (int, float)):
        return float(value)
    return value


@pytest.fixture(scope="module")
def golden():
    return json.load(open(GOLDEN_PATH))


@pytest.fixture(scope="module")
def rebuilt(spark, golden):
    periods = golden["payment_period_seqs"]
    riders = periods[0]["payment_premium_type_riders"]

    # payments: one row per golden period; zero-padded pmt_prd_seq so the
    # string-ordered W2 window reproduces the golden 1..N sequence
    payment_rows = []
    for p in periods:
        payment_rows.append(
            (
                golden["pmt_id"],
                golden["pmt_pol_id"],
                str(golden["pmt_premium_payment_year"]),
                "DP",
                "TP",
                "PM",
                str(golden["pmt_premium_payment_period_year"]),
                f"{p['pmt_prd_premium_seq']:02d}",
                p["pmt_prd_premium_date"][:10],
                p["pmt_prd_premium_due_date"][:10],
                p["pmt_prd_premium_date"][:10],
                p["pmt_prd_premium_date"][:10],
                p["pmt_prd_premium_receipt_number"],
                str(p["pmt_prd_premium_outstanding_payment"]),
                str(p["pmt_prd_premium_amount"]),
                None,
                None,
                "Pay-in & Bank Transfer",  # → channel '03'
                "",
            )
        )
    payments = spark.createDataFrame(payment_rows, PAYMENT_COLS)

    # premium riders: due dates chosen so OUR deterministic ordering
    # assigns each rider the suffix the golden file gave it
    rider_rows = []
    for r in riders:
        k = int(r["pmt_premium_rid_number"].rsplit("_", 1)[1])
        rider_rows.append(
            (
                f"{k:02d}",
                golden["pmt_id"],
                f"2007-01-{k:02d}",
                golden["pmt_pol_id"],
                "Rider",
                str(r["pmt_premium_rid_amount"]),
            )
        )
    premium = spark.createDataFrame(
        rider_rows,
        "sequence string, payment_header_seq string, due_date string,"
        " policy_number string, premium_level string, regular_premium string",
    )

    md_ref = spark.createDataFrame(
        [
            ("payment_type", "TP", golden["pmt_type"]),
            ("payment_direct_premium", "DP", golden["pmt_direct_premium"]),
            ("policy_payment_period", "PM", golden["pmt_payment_period"]),
        ],
        "md_name string, ktaxa_code string, id_code string",
    )
    policy_master = spark.createDataFrame(
        [(golden["pmt_pol_id"], "1")], "pno string, pstu string"
    )

    out = build_payment_documents(
        payments,
        policy_master,
        premium,
        md_ref,
        PaymentRunParams(),
        start_date="20080801",
        end_date="20090101",
    ).collect()
    assert len(out) == 1
    return _canon(out[0].asDict(recursive=True))


def test_header_fields_match_golden(golden, rebuilt):
    for field in (
        "pmt_refer_code_of_company",
        "pmt_transaction_status",
        "pmt_company_id",
        "pmt_pol_id",
        "pmt_pol_refer_code_of_company",
        "pmt_id",
        "pmt_type",
        "pmt_direct_premium",
        "pmt_payment_period",
    ):
        assert rebuilt[field] == golden[field], field
    assert rebuilt["pmt_premium_payment_period_year"] == float(
        golden["pmt_premium_payment_period_year"]
    )
    assert rebuilt["pmt_premium_payment_year"] == float(
        golden["pmt_premium_payment_year"]
    )


def test_every_period_matches_golden(golden, rebuilt):
    got = rebuilt["payment_period_seqs"]
    want = _canon(golden["payment_period_seqs"])
    assert len(got) == len(want)
    for g, w in zip(got, want):
        for key in w:
            if key == "payment_premium_type_riders":
                continue  # asserted separately below
            assert g[key] == w[key], (g["pmt_prd_premium_seq"], key)


def test_rider_arrays_match_golden_order_and_values(golden, rebuilt):
    """Including the infamous string-sort order _1,_10,_11,...,_2."""
    want = _canon(golden["payment_period_seqs"][0]["payment_premium_type_riders"])
    for period in rebuilt["payment_period_seqs"]:
        got = period["payment_premium_type_riders"]
        assert got == want
