"""Golden-document tests for the flagship payment pipeline (SURVEY §3.1,
§5 item 2): synthetic IBS-shaped fixtures per FIXTURES.md §1-4, exact
nested-document assertions per FIXTURES.md §6 / the golden-file quirks
(string-sorted rider arrays, channel decode fallback, period default
'05', null policies, due-date fallback)."""

from __future__ import annotations

from decimal import Decimal

import pytest

from ods_to_datalake_spark.plans.ordinary_payment import (
    PaymentRunParams,
    build_payment_documents,
)

PAYMENT_COLS = (
    "pmt_seq string, pol_no string, pol_year string, pmt_premium_type string,"
    " pmt_type string, prm_mode string, pmt_prm_term_year string,"
    " pmt_prd_seq string, trx_dt string, next_due_dt string, cbr_dt string,"
    " sub_dt string, receipt_no string, pmt_prd_outstanding string,"
    " trx_amount string, il_sp_prm string, tpl_sp_prm string,"
    " pmt_method string, pmt_channel string"
)


def _payment_row(**kw):
    base = dict(
        pmt_seq="5776815", pol_no="502-0193305", pol_year="2",
        pmt_premium_type="DP", pmt_type="TP", prm_mode="PM",
        pmt_prm_term_year="33", pmt_prd_seq="1", trx_dt="2008-08-28",
        next_due_dt="2007-02-25", cbr_dt="2008-08-28", sub_dt="2008-08-28",
        receipt_no="0005224108", pmt_prd_outstanding="0",
        trx_amount="19661.00", il_sp_prm=None, tpl_sp_prm=None,
        pmt_method="Pay-in & Bank Transfer", pmt_channel="",
    )
    base.update(kw)
    return tuple(base.values())


@pytest.fixture(scope="module")
def ibs_inputs(spark):
    payments = spark.createDataFrame(
        [
            # group 1: three periods, exercising order keys + decodes
            _payment_row(pmt_prd_seq="1"),
            _payment_row(pmt_prd_seq="2", next_due_dt="2007-03-26",
                         trx_amount=None, pmt_method="Cash",
                         pmt_channel="LINE PAY"),
            _payment_row(pmt_prd_seq="3", next_due_dt=None,
                         il_sp_prm="10.50", tpl_sp_prm=None,
                         pmt_method="Cash", pmt_channel="Branch",
                         trx_amount="100.25"),
            # group 2: lapsed policy, unmatched dim codes, blank term year
            _payment_row(pmt_seq="9000001", pol_no="LAPSED-01",
                         pmt_type="XX", pmt_premium_type="YY",
                         prm_mode="ZZ", pmt_prm_term_year=" ",
                         pol_year=None, pmt_method="Hotline",
                         trx_dt="2008-09-01", next_due_dt="2008-10-01"),
            # out of the date window — must be excluded
            _payment_row(pmt_seq="7777777", trx_dt="2010-01-01"),
        ],
        PAYMENT_COLS,
    )
    policy_master = spark.createDataFrame(
        [("502-0193305", "1"), ("LAPSED-01", "9")], "pno string, pstu string"
    )
    # 11 riders under the header → string sort gives _1,_10,_11,_2,...
    premium = spark.createDataFrame(
        [
            ("5776815", f"2007-0{(i % 9) + 1}-01", "502-0193305", "Rider",
             str(Decimal("2.43") + i))
            for i in range(11)
        ]
        + [("5776815", "2007-01-01", "502-0193305", "Basic", "19000.00")],
        "payment_header_seq string, due_date string, policy_number string,"
        " premium_level string, regular_premium string",
    )
    md_ref = spark.createDataFrame(
        [
            ("payment_type", "TP", "01"),
            ("payment_direct_premium", "DP", "02"),
            ("policy_payment_period", "PM", "01"),
            ("policy_payment_period", "ZZ", ""),  # empty → default '05'
            ("payment_type", "  ", "88"),  # blank code: must be filtered
        ],
        "md_name string, ktaxa_code string, id_code string",
    )
    return payments, policy_master, premium, md_ref


def _docs(spark, ibs_inputs, **params):
    payments, pol, prem, ref = ibs_inputs
    return {
        r["pmt_refer_code_of_company"]: r.asDict(recursive=True)
        for r in build_payment_documents(
            payments, pol, prem, ref,
            PaymentRunParams(**params),
            start_date="20080801", end_date="20090101",
        ).collect()
    }


def test_document_shape_and_decodes(spark, ibs_inputs):
    docs = _docs(spark, ibs_inputs)
    assert set(docs) == {"PMT_KAL_5776815_1", "PMT_KAL_9000001_1"}

    d = docs["PMT_KAL_5776815_1"]
    assert d["pmt_transaction_status"] == ""  # golden, not code's 'N'
    assert d["pmt_company_id"] == "1022"
    assert d["pmt_pol_refer_code_of_company"] == "POL_KAL_502-0193305"
    assert d["pmt_id"] == "5776815"
    assert d["pmt_type"] == "01"
    assert d["pmt_direct_premium"] == "02"
    assert d["pmt_premium_payment_period_year"] == 33
    assert d["pmt_premium_payment_year"] == 2
    assert d["pmt_payment_period"] == "01"


def test_period_structs(spark, ibs_inputs):
    d = _docs(spark, ibs_inputs)["PMT_KAL_5776815_1"]
    periods = d["payment_period_seqs"]
    assert [p["pmt_prd_premium_seq"] for p in periods] == [1, 2, 3]

    p1, p2, p3 = periods
    assert p1["pmt_prd_premium_amount"] == Decimal("19661.00")
    assert p1["pmt_prd_premium_amount_life"] == Decimal("19661.00")
    assert p1["pmt_prd_premium_date"] == "2008-08-28T00:00:00+07:00"
    assert p1["pmt_prd_premium_due_date"] == "2007-02-25T00:00:00+07:00"
    assert p1["pmt_prd_premium_channel"] == "03"
    assert p1["pmt_prd_premium_receipt_number"] == "0005224108"
    # endorsement literal array
    assert p1["payment_premium_type_endorsements"] == [
        {"pmt_premium_edm_number": None,
         "pmt_premium_edm_amount": Decimal("0.00")}
    ]

    # null trx_amount → required-dec sentinel; Cash+counter channel '07'
    assert p2["pmt_prd_premium_amount"] == Decimal("0.00")
    assert p2["pmt_prd_premium_channel"] == "07"

    # null next_due_dt falls back to trx_dt; Cash+other channel '02';
    # investment = null-safe il+tpl
    assert p3["pmt_prd_premium_due_date"] == "2008-08-28T00:00:00+07:00"
    assert p3["pmt_prd_premium_channel"] == "02"
    assert p3["pmt_prd_premium_amt_investment"] == Decimal("10.50")


def test_rider_array_string_sort(spark, ibs_inputs):
    """11 riders sort as strings: _1,_10,_11,_2,...,_9 — the golden-file
    order (PMT_KAL_5776815_1.json:34-112)."""
    d = _docs(spark, ibs_inputs)["PMT_KAL_5776815_1"]
    riders = d["payment_period_seqs"][0]["payment_premium_type_riders"]
    nums = [r["pmt_premium_rid_number"] for r in riders]
    assert nums == [
        f"502-0193305_{i}" for i in ["1", "10", "11", "2", "3", "4", "5",
                                     "6", "7", "8", "9"]
    ]
    assert riders[0]["pmt_premium_rid_amount"] == Decimal("2.43")


def test_unmatched_dims_and_defaults(spark, ibs_inputs):
    d = _docs(spark, ibs_inputs)["PMT_KAL_9000001_1"]
    assert d["pmt_type"] is None  # unmatched decode stays null
    assert d["pmt_direct_premium"] is None
    assert d["pmt_payment_period"] == "05"  # empty oic → default
    assert d["pmt_premium_payment_period_year"] == 0  # blank → sentinel
    assert d["pmt_premium_payment_year"] == 0  # null → sentinel
    p = d["payment_period_seqs"][0]
    assert p["pmt_prd_premium_channel"] == "99"  # fallback decode
    assert p["payment_premium_type_riders"] is None  # no riders attached


def test_workflow_source_selection(spark, ibs_inputs):
    inforce = _docs(spark, ibs_inputs, workflow_type="One-Time-Inforce")
    assert set(inforce) == {"PMT_KAL_5776815_1"}
    noninf = _docs(spark, ibs_inputs, workflow_type="One-Time-Non-Inforce")
    assert set(noninf) == {"PMT_KAL_9000001_1"}


def test_new_spec_sums_and_id(spark, ibs_inputs):
    d = _docs(spark, ibs_inputs, spec="new")["PMT_KAL_5776815_1"]
    p1 = d["payment_period_seqs"][0]
    # riders: 2.43+3.43+...+12.43 = 11*2.43 + (0+..+10) = 26.73+55 = 81.73
    assert p1["pmt_prd_premium_amount"] == Decimal("19081.73")  # basic+rider
    assert p1["pmt_prd_premium_amount_life"] == Decimal("19000.00")  # basic
    assert isinstance(d["id"], str) and len(d["id"]) == 64


def test_deterministic_ids(spark, ibs_inputs):
    a = _docs(spark, ibs_inputs, spec="new")
    b = _docs(spark, ibs_inputs, spec="new")
    assert {k: v["id"] for k, v in a.items()} == {
        k: v["id"] for k, v in b.items()
    }
