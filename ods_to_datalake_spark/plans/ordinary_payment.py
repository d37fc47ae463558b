"""The flagship document pipeline (SURVEY §3.1), generalized.

The reference's `ordinary_payment_aggregation`
(ibs_ordinary_payment_utilities.py:21-309) builds a nested per-payment
document: source-select → child pre-fold → attach → window-sequence →
document fold → dimension decorate → surrogate key → final projection.

Two faces here:

- `build_payment_documents(...)`: the generalized pipeline over IBS-shaped
  inputs (schemas per FIXTURES.md) — exercised by the golden-doc tests.
- `order_documents(spark, sf_dir)`: the same operator composition mapped
  onto the testdata star schema (orders=headers, lineitem=periods,
  customer/nation=dims) — the driver's `entry()` flagship.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ods_to_datalake_spark.catalog import load_testdata
from ods_to_datalake_spark.functions import nulls
from ods_to_datalake_spark.functions.decode import case_decode, dim_slice
from ods_to_datalake_spark.functions.timefmt import iso_ts_string
from ods_to_datalake_spark.operators import joins as join_ops
from ods_to_datalake_spark.operators import nest, windows

D182 = T.DecimalType(18, 2)

# ---------------------------------------------------------------------------
# The IBS ordinary-payment pipeline, generalized
# ---------------------------------------------------------------------------

# Inforce policy statuses (ibs_ordinary_payment_utilities.py:33).
INFORCE_STATUSES = ("1", "2", "5", "6", "B", "F")

# Payment-channel decode table (ibs_ordinary_payment_utilities.py:221-241),
# data-driven instead of a hand-written when-chain. Order matters.
CASH_COUNTER_CHANNELS = (
    "Counter Service", "AIS", "Big C", "EDC", "LINE PAY", "LinePay",
    "mPOS", "Quickpay", "Tesco Lotus", "True Money",
)


def _channel_code(method: Column, channel: Column) -> Column:
    m, c = F.trim(method), F.trim(channel)
    return case_decode(
        [
            ((m == "Cash") & ~c.isin(*CASH_COUNTER_CHANNELS), "02"),
            ((m == "Cash") & c.isin(*CASH_COUNTER_CHANNELS), "07"),
            (m.isin("Pay-in & Bank Transfer", "Card Payment"), "03"),
            (m == "Cheque", "04"),
            (m == "Debit Authorization (DA)", "05"),
            (m == "Credit Card Payment Auth (CCPA)", "06"),
        ],
        default="99",
    ).cast(T.StringType())


@dataclass
class PaymentRunParams:
    """Run parameters (O6/O7 surface): workflow type selects the source
    predicate (ibs_ordinary_payment_utilities.py:23-55)."""

    workflow_type: str = "Daily"  # | One-Time-Inforce | One-Time-Non-Inforce
    # Reference code stamps 'N' (:63,:267) but the golden document carries
    # '' (PMT_KAL_5776815_1.json:3) — default to golden (SURVEY §7.4).
    transaction_status: str = ""
    company_id: str = "1022"
    # 'golden' reproduces current behavior; 'new' applies the revised spec
    # (PMT_KAL_5776815_1_New.json:17-19): premium amount = Basic + Rider
    # sums from the premium schedule, life amount = Basic only, plus a
    # content-hash document id (:346).
    spec: str = "golden"


def select_payment_source(
    payments: DataFrame,
    policy_master: DataFrame,
    params: PaymentRunParams,
    start_date: str,
    end_date: str,
) -> DataFrame:
    """Workflow-typed source selection (§3.1 step 1).

    Dates compared as yyyyMMdd strings over the parsed trx_dt, half-open
    [start, end) — identical predicate to the reference (:27-28). The
    inforce/non-inforce paths use a true left_semi (the reference's
    inner-join + select(left['*']) keeps duplicate matches if the policy
    master had duplicate pno rows; semi-join is the intended semantics
    and shuffles no right-side payload).
    """
    date_key = F.date_format(
        F.to_date(F.col("trx_dt"), "yyyy-MM-dd"), "yyyyMMdd"
    )
    in_window = (date_key >= start_date) & (date_key < end_date)

    if params.workflow_type == "Daily":
        return payments.filter(in_window)
    if params.workflow_type == "One-Time-Inforce":
        pol = policy_master.filter(F.col("pstu").isin(*INFORCE_STATUSES))
    elif params.workflow_type == "One-Time-Non-Inforce":
        pol = policy_master.filter(~F.col("pstu").isin(*INFORCE_STATUSES))
    else:
        raise ValueError(f"unknown workflow_type {params.workflow_type!r}")
    return join_ops.semi_join(
        payments.filter(in_window),
        pol,
        payments["pol_no"] == pol["pno"],
    )


def fold_riders(premium: DataFrame) -> DataFrame:
    """Rider pre-aggregation (§3.1 step 2, reference :80-101): Rider rows
    → per-header row_number by due_date → `<policy>_<n>` rider ids →
    sorted array-of-struct. Pre-folding BEFORE the header join keeps the
    wide document fold free of the rider cross-product."""
    # NB: the reference orders by due_date alone (:84) — nondeterministic
    # when two riders share a due date; we append tiebreakers (schedule
    # `sequence` when present, then policy/amount) so rider numbering —
    # and thus doc content hashes — is stable.
    order_keys: list = ["due_date"]
    if "sequence" in premium.columns:
        order_keys.append("sequence")
    order_keys += [
        F.col("policy_number"),
        F.col("regular_premium").cast(D182),  # numeric, not string, order
    ]
    riders = windows.sequence(
        premium.filter(F.col("premium_level") == "Rider"),
        ["payment_header_seq"],
        order_keys,
        out_col="row_num",
    ).select(
        "payment_header_seq",
        F.concat_ws(
            "_",
            F.col("policy_number").cast(T.StringType()),
            F.col("row_num").cast(T.StringType()),
        ).alias("pmt_premium_rid_number"),
        F.col("regular_premium").cast(D182).alias("pmt_premium_rid_amount"),
    )
    # NB: sort key is the string rid number — '_1','_10','_11',...,'_2'
    # (golden-file order, PMT_KAL_5776815_1.json:34-112).
    return nest.fold_to_array(
        riders,
        ["payment_header_seq"],
        ["pmt_premium_rid_number", "pmt_premium_rid_amount"],
        out_col="paymentrider",
    )


def premium_level_sums(premium: DataFrame) -> DataFrame:
    """Per-header Basic/Rider premium sums for the 'new' spec
    (PMT_KAL_5776815_1_New.json:17-19) — one extra pre-aggregation,
    same shuffle key as the rider fold."""
    lvl = F.trim(F.lower(F.col("premium_level")))
    amt = F.col("regular_premium").cast(D182)
    zero = F.lit(0).cast(D182)
    return premium.groupBy("payment_header_seq").agg(
        F.sum(F.when(lvl == "basic", amt).otherwise(zero))
        .cast(D182)
        .alias("basic_premium_sum"),
        F.sum(F.when(lvl == "rider", amt).otherwise(zero))
        .cast(D182)
        .alias("rider_premium_sum"),
    )


def _period_struct(params: PaymentRunParams) -> list[Column]:
    """The 20-field payment-period struct (§3.1 step 6, reference
    :157-250), expressed through the table-driven null policy."""
    dec0 = F.lit(0).cast(D182)
    if params.spec == "new":
        amount = F.coalesce(
            nulls.null_safe_add("basic_premium_sum", "rider_premium_sum"),
            dec0,
        ).cast(D182)
        life = F.coalesce(F.col("basic_premium_sum").cast(D182), dec0)
    else:
        amount = nulls.req("trx_amount", "dec")
        life = nulls.req("trx_amount", "dec")
    return [
        nulls.req("pmt_prd_premium_seq", "int").alias("pmt_prd_premium_seq"),
        nulls.req("pmt_prd_outstanding", "int").alias(
            "pmt_prd_premium_outstanding_payment"
        ),
        amount.alias("pmt_prd_premium_amount"),
        dec0.alias("pmt_prd_premium_amount_tax"),
        life.alias("pmt_prd_premium_amount_life"),
        dec0.alias("pmt_prd_premium_amt_saving"),
        F.coalesce(
            nulls.null_safe_add("il_sp_prm", "tpl_sp_prm"), dec0
        ).cast(D182).alias("pmt_prd_premium_amt_investment"),
        dec0.alias("pmt_prd_premium_amount_other"),
        dec0.alias("pmt_prd_premium_amount_com"),
        dec0.alias("pmt_prd_premium_amt_interest"),
        iso_ts_string("trx_dt").alias("pmt_prd_premium_date"),
        iso_ts_string("next_due_dt", fallback="trx_dt").alias(
            "pmt_prd_premium_due_date"
        ),
        iso_ts_string("trx_dt").alias("pmt_prd_premium_temp_receipt_date"),
        iso_ts_string("trx_dt").alias("pmt_prd_premium_receipt_date"),
        nulls.req("receipt_no", "str").alias(
            "pmt_prd_premium_temp_receipt_number"
        ),
        nulls.req("receipt_no", "str").alias("pmt_prd_premium_receipt_number"),
        _channel_code(F.col("pmt_method"), F.col("pmt_channel")).alias(
            "pmt_prd_premium_channel"
        ),
        F.lit(None).cast(T.StringType()).alias("pmt_prd_premium_channel_detail"),
        F.col("paymentrider").alias("payment_premium_type_riders"),
        F.array(
            F.struct(
                F.lit(None).cast(T.StringType()).alias("pmt_premium_edm_number"),
                dec0.alias("pmt_premium_edm_amount"),
            )
        ).alias("payment_premium_type_endorsements"),
    ]


GROUP_KEYS = (
    "pmt_seq", "pol_no", "pol_year", "pmt_premium_type",
    "pmt_type", "prm_mode", "pmt_prm_term_year",
)
PERIOD_ORDER = (
    "pmt_prd_seq", "trx_dt", "next_due_dt", "cbr_dt", "sub_dt", "receipt_no",
)


def build_payment_documents(
    payments: DataFrame,
    policy_master: DataFrame,
    premium: DataFrame,
    md_ref: DataFrame,
    params: PaymentRunParams | None = None,
    start_date: str = "00000000",
    end_date: str = "99999999",
) -> DataFrame:
    """The flagship pipeline (§3.1 steps 1-8) on engine operators.

    Input schemas per FIXTURES.md §1-4. Output: one nested document per
    (pmt_seq, pol_no, pol_year, pmt_premium_type, pmt_type, prm_mode,
    pmt_prm_term_year) group, FIXTURES.md §6 shape.

    Scale shape: two keyed shuffles for the pre-folds (header key), one
    shuffle for the document fold (7-key group), windows reuse the fold
    partitioning, dimensions broadcast — the fact table is shuffled
    exactly twice end-to-end (attach + fold).
    """
    params = params or PaymentRunParams()

    # 1. source selection
    fact = select_payment_source(
        payments, policy_master, params, start_date, end_date
    )

    # 2-3. rider pre-fold + attach (J2)
    riders = fold_riders(premium)
    fact = join_ops.left_attach(
        fact, riders, fact["pmt_seq"] == riders["payment_header_seq"]
    ).drop("payment_header_seq")
    if params.spec == "new":
        sums = premium_level_sums(premium)
        fact = join_ops.left_attach(
            fact, sums, fact["pmt_seq"] == sums["payment_header_seq"]
        ).drop("payment_header_seq")

    # 4. period sequencing (W2)
    fact = windows.sequence(
        fact, list(GROUP_KEYS), list(PERIOD_ORDER),
        out_col="pmt_prd_premium_seq",
    )

    # 5. dimension slices of the generic ref table
    dim_type = dim_slice(
        md_ref, "md_name", "payment_type", "ktaxa_code",
        {"ktaxa_code": "payment_type_ktaxa_code",
         "id_code": "payment_type_oic_code"},
    ).select("payment_type_ktaxa_code", "payment_type_oic_code")
    dim_direct = dim_slice(
        md_ref, "md_name", "payment_direct_premium", "ktaxa_code",
        {"ktaxa_code": "payment_direct_premium_ktaxa_code",
         "id_code": "payment_direct_premium_oic_code"},
    ).select("payment_direct_premium_ktaxa_code",
             "payment_direct_premium_oic_code")
    dim_period = dim_slice(
        md_ref, "md_name", "policy_payment_period", "ktaxa_code",
        {"ktaxa_code": "payment_period_ktaxa_code",
         "id_code": "payment_period_oic_code"},
    ).select("payment_period_ktaxa_code", "payment_period_oic_code")

    # 6. document fold (A2/A5): one shuffle on the 7 group keys
    doc = nest.fold_to_array(
        fact,
        list(GROUP_KEYS),
        _period_struct(params),
        out_col="payment_period_seqs",
    )

    # 7. decorate: broadcast dim decodes (J3), surrogate key (W3),
    #    constants, guarded casts
    doc = join_ops.left_attach(
        doc, dim_type,
        doc["pmt_type"] == dim_type["payment_type_ktaxa_code"],
        broadcast=True,
    )
    doc = join_ops.left_attach(
        doc, dim_direct,
        doc["pmt_premium_type"]
        == dim_direct["payment_direct_premium_ktaxa_code"],
        broadcast=True,
    )
    doc = join_ops.left_attach(
        doc, dim_period,
        doc["prm_mode"] == dim_period["payment_period_ktaxa_code"],
        broadcast=True,
    )
    # NB: the reference orders by 5 of the 7 group keys (:262-266);
    # pmt_prm_term_year is appended so the suffix is deterministic when
    # documents differ only in term year.
    doc = windows.surrogate_key(
        doc,
        "PMT_KAL_",
        ["pmt_seq"],
        ["pol_no", "pmt_type", "pmt_premium_type", "pol_year", "prm_mode",
         "pmt_prm_term_year"],
        out_col="pmt_refer_code_of_company",
    )

    # 8. final projection (12 output fields, FIXTURES.md §6)
    out_cols = [
        F.col("pmt_refer_code_of_company").cast(T.StringType()).alias(
            "pmt_refer_code_of_company"
        ),
        F.lit(params.transaction_status).cast(T.StringType()).alias(
            "pmt_transaction_status"
        ),
        F.lit(params.company_id).cast(T.StringType()).alias("pmt_company_id"),
        F.col("pol_no").cast(T.StringType()).alias("pmt_pol_id"),
        F.concat(F.lit("POL_KAL_"), F.col("pol_no"))
        .cast(T.StringType())
        .alias("pmt_pol_refer_code_of_company"),
        F.col("pmt_seq").cast(T.StringType()).alias("pmt_id"),
        F.col("payment_type_oic_code").cast(T.StringType()).alias("pmt_type"),
        F.col("payment_direct_premium_oic_code")
        .cast(T.StringType())
        .alias("pmt_direct_premium"),
        F.coalesce(nulls.guarded_int("pmt_prm_term_year"), F.lit(0)).alias(
            "pmt_premium_payment_period_year"
        ),
        F.coalesce(nulls.guarded_int("pol_year"), F.lit(0)).alias(
            "pmt_premium_payment_year"
        ),
        F.when(
            F.col("payment_period_oic_code") != "",
            F.col("payment_period_oic_code").cast(T.StringType()),
        ).otherwise(F.lit("05")).alias("pmt_payment_period"),
        F.col("payment_period_seqs"),
    ]
    if params.spec == "new":
        out = doc.select(*out_cols)
        return out.withColumn(
            "id", nest.doc_id(*[F.col(c) for c in out.columns])
        )
    return doc.select(*out_cols)


def order_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nested order documents: one row per order with a sorted
    array-of-struct `periods` column, dimension decodes, and a
    content-hash id — the A2 fold in its real nested form."""
    cat = load_testdata(spark, sf_dir)
    orders, li = cat.table("orders"), cat.table("lineitem")
    cust, nation = cat.table("customer"), cat.table("nation")

    # child sequence within each document (W2) then fold (A2/A5):
    seq = windows.sequence(
        li,
        ["l_orderkey"],
        ["l_shipdate", "l_linenumber"],
        out_col="period_seq",
    )
    folded = nest.fold_to_array(
        seq,
        ["l_orderkey"],
        [
            # first field = sort key (lexicographic struct compare)
            F.lpad(F.col("period_seq").cast("string"), 4, "0").alias("seq"),
            F.col("l_linenumber").cast("int").alias("line_number"),
            F.col("l_quantity").cast(D182).alias("quantity"),
            F.col("l_extendedprice").cast(D182).alias("extended_price"),
            F.col("l_returnflag").alias("return_flag"),
            iso_ts_string(
                F.date_format(F.col("l_shipdate").cast("date"), "yyyy-MM-dd")
            ).alias("ship_ts"),
        ],
        out_col="periods",
        extra_aggs=[F.count("*").alias("n_periods")],
    )

    # header + child attach (J2), customer/nation decode (J3, broadcast):
    doc = join_ops.left_attach(
        orders, folded, orders["o_orderkey"] == folded["l_orderkey"]
    )
    doc = join_ops.left_attach(
        doc, cust, doc["o_custkey"] == cust["c_custkey"], broadcast=True
    )
    doc = join_ops.left_attach(
        doc, nation, cust["c_nationkey"] == nation["n_nationkey"],
        broadcast=True,
    )

    # surrogate key (W3) and content-hash id (S6):
    doc = windows.surrogate_key(
        doc,
        "ORD_KAL_",
        ["o_custkey"],
        ["o_orderdate", "o_orderkey"],
        out_col="refer_code",
    )
    return doc.select(
        "o_orderkey",
        F.col("refer_code"),
        F.col("c_name").alias("customer_name"),
        F.col("n_name").alias("nation_name"),
        F.col("o_totalprice").cast(D182).alias("total_price"),
        F.col("o_orderdate").cast("date").alias("order_date"),
        F.coalesce("n_periods", F.lit(0)).alias("n_periods"),
        F.coalesce(
            "periods",
            F.array().cast(doc.schema["periods"].dataType),
        ).alias("periods"),
        nest.doc_id("o_orderkey", "refer_code", "periods").alias("id"),
    )
