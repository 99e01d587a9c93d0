"""Catalog entries q171-q185: classical-statistics auditing over the
corpus — the rank tests, independence tests, regression diagnostics,
association rules, and sketches a data-quality review runs before a
training mix ships, plus the score-calibration family (q179-q181,
q184-q185: isotonic PAV, gains, Youden-J, ROC AUC, Brier) and the
survival pair (q182 Kaplan-Meier, q183 log-rank).

Where q160 (Welch z) compares MEANS, q171 (Mann-Whitney) compares whole
distributions rank-wise and q172 (Spearman) rank-correlates two columns;
q177 (chi-squared) tests categorical independence where q153 measured
conditional entropy; q175 fits the OLS line whose robust sibling is
q166's Theil-Sen; q174 adds the count-min sketch beside q63's HLL;
q176 (Benford) and q178 (permutation entropy) are anomaly screens for
fabricated counts and structureless series.

Determinism conventions (the q117/q144/q154 discipline):

- counts, ranks, and U statistics are EXACT BIGINTS (rank sums carry
  2x the average rank so ties stay integral; U carries 2U);
- libm-transcendental terms (ln, log-ratio) round to 6-9 digits and
  decimal(38,x)-sum so partition order can't change totals;
- closed-form quotients (z, rho, slope, lift, chi-squared terms) are
  fixed sequences of IEEE ops over exact integers — every cast,
  multiply, divide, and sqrt is correctly rounded, so both engines
  produce bit-identical doubles; explicit parentheses pin the order;
- Benford expectations are 9-digit DECIMAL LITERALS, not engine log10;
- every ORDER BY before a LIMIT carries a unique-key tiebreak.

Scale notes (SCALE.md discipline):

- q171/q172's only ordered windows run over DISTINCT-VALUE histograms
  (support-bounded, the q144 class — allowlisted in tests/test_plans.py
  with their bounds);
- q173's self-join is within user_id after a distinct — per-user row
  count is bounded by the event-type vocabulary, never corpus rows;
- q174's sketch is a fixed d x w = 4 x 64 cell table (map-side
  combinable agg), candidates come from TakeOrderedAndProject;
- q175 aggregates to calendar days before the bounded solve;
- q176/q177 reduce to digit/category contingency tables first;
- q179-q185 reduce to ONE checkpointed <= 64-row histogram (score
  buckets or calendar-day durations) and solve with bounded join-cums —
  range joins over those tables carry /*+ BROADCAST */ hints, or
  Catalyst plans them as CartesianProduct.
"""

from __future__ import annotations

from .queries import register, sql_case
from .session import load_tables

# shared tokenizer (q137/q163's form)
_TOK_SPARK = (
    "explode(split(trim(regexp_replace(lower(text), '\\\\s+', ' ')), ' '))"
)
_TOK_DUCK = (
    "unnest(string_split(trim(regexp_replace(lower(text), '\\s+', ' ', "
    "'g')), ' '))"
)

# exact FLOOR division on BOTH engines (Spark div AND DuckDB 1.0 //
# truncate toward zero; % keeps the dividend sign on both, so the same
# correction term floors each side — pre-1970 partial days land on the
# right calendar day). ADVICE r6/r7 family.
_EPOCHDAY_SPARK = (
    "(unix_micros(cast(ts as timestamp)) div 86400000000"
    " - (case when unix_micros(cast(ts as timestamp)) % 86400000000 < 0"
    " then 1 else 0 end))"
)
_EPOCHDAY_DUCK = (
    "(epoch_us(ts) // 86400000000"
    " - (case when epoch_us(ts) % 86400000000 < 0 then 1 else 0 end))"
)


# ---------------------------------------------------------------------------
# q171 — Mann-Whitney U between the two largest sources' doc-length
# distributions: the rank-sum complement to q160's parametric z-test and
# q144's KS (same two-source frame). 2U_a = sum over the merged support
# of ca * (2*cumB(<v) + cb) — pure bigint; the normal-approximation z
# carries the exact tie correction sum(t^3 - t). The cumulative window
# runs over DISTINCT length values (support-bounded, q144's bound).
# ---------------------------------------------------------------------------

_Q171_BODY = """
    with lens as (select source, cast(n_chars as bigint) as v
                  from documents where n_chars is not null),
    st as (select source, cast(count(*) as bigint) as n
           from lens group by source),
    big as (select source, n from st order by n desc, source limit 2),
    pr as (select a.source as sa, a.n as na, b.source as sb, b.n as nb
           from big a join big b on a.source < b.source),
    cv as (select l.source, l.v, cast(count(*) as bigint) as c
           from lens l join big on big.source = l.source
           group by l.source, l.v),
    merged as (
      select v,
             cast(sum(case when source = (select sa from pr) then c
                           else 0 end) as bigint) as ca,
             cast(sum(case when source = (select sb from pr) then c
                           else 0 end) as bigint) as cb
      from cv group by v
    ),
    cum as (
      select v, ca, cb,
             sum(cb) over (order by v
               rows between unbounded preceding and current row) as cum_b
      from merged
    ),
    u as (select cast(sum(ca * (2 * (cum_b - cb) + cb)) as bigint) as u2_a
          from cum),
    ties as (select cast(sum((ca + cb) * (ca + cb) * (ca + cb)
                             - (ca + cb)) as bigint) as t3t
             from merged)
    select pr.sa as source_a, pr.sb as source_b,
           pr.na as n_a, pr.nb as n_b,
           u.u2_a,
           cast(2 * pr.na * pr.nb - u.u2_a as bigint) as u2_b,
           ties.t3t as tie_cubes,
           round(cast(u.u2_a as double)
                 / (2.0 * (cast(pr.na as double) * cast(pr.nb as double))),
                 6) as auc,
           round((cast(u.u2_a as double)
                  - (cast(pr.na as double) * cast(pr.nb as double)))
                 / (2.0 * sqrt(
                     ((cast(pr.na as double) * cast(pr.nb as double))
                      * ((cast(pr.na + pr.nb + 1 as double)
                          * cast(pr.na + pr.nb as double)
                          * cast(pr.na + pr.nb - 1 as double))
                         - cast(ties.t3t as double)))
                     / (12.0 * (cast(pr.na + pr.nb as double)
                                * cast(pr.na + pr.nb - 1 as double))))),
                 6) as z
    from pr cross join u cross join ties
"""

sql_case(
    "q171_mann_whitney_u",
    _Q171_BODY,
    _Q171_BODY,
    doc="Mann-Whitney U rank test between the two largest sources' "
    "doc-length distributions: 2U and the tie-cube sum are exact "
    "bigints from the merged count-of-counts histogram; z applies the "
    "exact tie-corrected normal approximation as a fixed IEEE op "
    "sequence; auc = U/(na*nb) is the probability-of-superiority "
    "effect size. The cumulative window is over distinct LENGTH "
    "VALUES (bounded support, q144's class), never corpus rows",
)


# ---------------------------------------------------------------------------
# q172 — Spearman rank correlation between doc length (n_chars) and
# token count. Average ranks (ties) come from each variable's
# count-of-counts histogram — r2 = 2*cum(<v) + c + 1 is TWICE the
# average rank, kept integral — then Pearson on the integer 2r values
# via decimal(38,0) sums. No global row_number: the only ordered
# windows run over the two distinct-value histograms (the q118 lesson).
# ---------------------------------------------------------------------------

_Q172_BODY = """
    with d as (select doc_id, cast(n_chars as bigint) as x,
                      cast({NTOK} as bigint) as y
               from documents
               where n_chars is not null and text is not null),
    hx as (select x, cast(count(*) as bigint) as c from d group by x),
    cx as (select x,
                  2 * (sum(c) over (order by x
                    rows between unbounded preceding and current row) - c)
                  + c + 1 as rx
           from hx),
    hy as (select y, cast(count(*) as bigint) as c from d group by y),
    cy as (select y,
                  2 * (sum(c) over (order by y
                    rows between unbounded preceding and current row) - c)
                  + c + 1 as ry
           from hy),
    r as (select cx.rx, cy.ry
          from d join cx on d.x = cx.x join cy on d.y = cy.y),
    s as (select cast(count(*) as bigint) as n,
                 cast(sum(cast(rx as decimal(38,0))) as decimal(38,0)) as sx,
                 cast(sum(cast(ry as decimal(38,0))) as decimal(38,0)) as sy,
                 cast(sum(cast(rx * ry as decimal(38,0))) as decimal(38,0))
                   as sxy,
                 cast(sum(cast(rx * rx as decimal(38,0))) as decimal(38,0))
                   as sxx,
                 cast(sum(cast(ry * ry as decimal(38,0))) as decimal(38,0))
                   as syy
          from r)
    select n,
           round((cast(n as double) * cast(sxy as double)
                  - cast(sx as double) * cast(sy as double))
                 / (sqrt(cast(n as double) * cast(sxx as double)
                         - cast(sx as double) * cast(sx as double))
                    * sqrt(cast(n as double) * cast(syy as double)
                           - cast(sy as double) * cast(sy as double))),
                 6) as spearman_rho
    from s
"""

sql_case(
    "q172_spearman_rho",
    _Q172_BODY.replace(
        "{NTOK}",
        "size(split(trim(regexp_replace(lower(text), '\\\\s+', ' ')), ' '))",
    ),
    _Q172_BODY.replace(
        "{NTOK}",
        "len(string_split(trim(regexp_replace(lower(text), '\\s+', ' ', "
        "'g')), ' '))",
    ),
    doc="Spearman rank correlation between doc length and token count: "
    "tie-averaged ranks are kept integral as 2r from each variable's "
    "count-of-counts histogram (cumulative windows over DISTINCT "
    "values only — bounded support), Pearson moments decimal(38,0)-"
    "summed, rho as one fixed IEEE quotient. The monotone complement "
    "to q175's linear OLS fit",
)


# ---------------------------------------------------------------------------
# q173 — association rules over per-user event-type baskets:
# support / confidence / lift for every co-occurring type pair. The
# market-basket primitive. Baskets are DISTINCT (user, type) rows, so
# the within-user self-join fans out at most (types-per-user choose 2)
# rows per user — bounded by the event-type vocabulary, never by the
# user's raw event count. One hash shuffle on user_id; top pairs via
# ORDER BY + LIMIT (TakeOrderedAndProject).
# ---------------------------------------------------------------------------

_Q173_BODY = """
    with b as (select distinct user_id, event_type
               from events
               where user_id is not null and event_type is not null),
    n as (select cast(count(distinct user_id) as bigint) as n_users from b),
    it as (select event_type, cast(count(*) as bigint) as c
           from b group by event_type),
    pairs as (
      select l.event_type as antecedent, r.event_type as consequent,
             cast(count(*) as bigint) as pair_users
      from b l join b r
        on l.user_id = r.user_id and l.event_type < r.event_type
      group by l.event_type, r.event_type
    )
    select p.antecedent, p.consequent, p.pair_users,
           ia.c as ante_users, ic.c as cons_users, n.n_users,
           round(cast(p.pair_users as double) / cast(n.n_users as double),
                 6) as support,
           round(cast(p.pair_users as double) / cast(ia.c as double),
                 6) as conf_a_to_c,
           round(cast(p.pair_users as double) / cast(ic.c as double),
                 6) as conf_c_to_a,
           round((cast(p.pair_users as double) * cast(n.n_users as double))
                 / (cast(ia.c as double) * cast(ic.c as double)),
                 6) as lift
    from pairs p
    join it ia on ia.event_type = p.antecedent
    join it ic on ic.event_type = p.consequent
    cross join n
    order by lift desc, p.antecedent, p.consequent
    limit 15
"""

sql_case(
    "q173_assoc_rules",
    _Q173_BODY,
    _Q173_BODY,
    doc="association rules over per-user event-type baskets: exact "
    "pair/antecedent/consequent user counts, support, both "
    "directional confidences, and lift as fixed IEEE quotients of "
    "exact bigints. Distinct-first bounds the within-user self-join "
    "fan-out by the type vocabulary; one user_id shuffle; top-15 by "
    "lift via ORDER BY + LIMIT",
)


# ---------------------------------------------------------------------------
# q174 — count-min sketch (d=4 rows x w=64 buckets) over the token
# stream, audited against exact counts for the top-10 tokens. The
# frequency-sketch sibling of q63's HLL: est(tok) = min over rows of
# cell[r, h_r(tok)] >= true count, with overestimate = collision mass.
# Hashes are md5-derived bigints (the q45 conv/0x recipe) so both
# engines build the identical sketch. The sketch is a fixed 256-cell
# aggregation (map-side combinable); candidates come from
# TakeOrderedAndProject; at 100 TB the cells table broadcasts.
# ---------------------------------------------------------------------------

_Q174_BODY = """
    with toks as (select {TOKENS} as tok from documents),
    tc as (select tok, cast(count(*) as bigint) as c
           from toks where tok <> '' group by tok),
    rows4 as (select 0 as r union all select 1
              union all select 2 union all select 3),
    hashed as (
      select rows4.r, tc.tok, tc.c,
             {H} % 64 as bucket
      from tc cross join rows4
    ),
    cells as (select r, bucket, cast(sum(c) as bigint) as cell
              from hashed group by r, bucket),
    top as (select tok, c from tc order by c desc, tok limit 10)
    select t.tok, t.c as exact_count,
           cast(min(cl.cell) as bigint) as cms_estimate,
           cast(min(cl.cell) - t.c as bigint) as overestimate
    from top t
    join hashed h on h.tok = t.tok
    join cells cl on cl.r = h.r and cl.bucket = h.bucket
    group by t.tok, t.c
    order by t.c desc, t.tok
"""

_H_SPARK = (
    "cast(conv(substr(md5(cast(rows4.r as string) || ':' || tc.tok), 1, 12),"
    " 16, 10) as bigint)"
)
_H_DUCK = (
    "('0x' || substr(md5(cast(rows4.r as varchar) || ':' || tc.tok), 1, 12))"
    "::bigint"
)

sql_case(
    "q174_countmin_sketch",
    _Q174_BODY.replace("{TOKENS}", _TOK_SPARK).replace("{H}", _H_SPARK),
    _Q174_BODY.replace("{TOKENS}", _TOK_DUCK).replace("{H}", _H_DUCK),
    doc="count-min sketch (4 x 64, md5-derived row hashes) over the "
    "token stream, audited against exact counts for the top-10 "
    "tokens: estimate = min over rows of the hit cell, always >= "
    "exact, overestimate = collision mass. Fixed 256-cell map-side-"
    "combinable aggregation; identical sketch on both engines via "
    "the conv/0x bigint-from-md5 recipe",
)


# ---------------------------------------------------------------------------
# q175 — OLS trend of daily event volume: slope/intercept/R^2 in closed
# form from exact decimal sums over the DAY table (calendar-bounded, the
# q166 frame — q166 fits the robust Theil-Sen median slope, this is the
# classical least-squares line plus its fit quality). x is centered at
# the first day so moments stay small and exact.
# ---------------------------------------------------------------------------

_Q175_FIXED = """
    with days as (select {EPOCHDAY} as day, cast(count(*) as bigint) as y
                  from events group by {EPOCHDAY}),
    base as (select min(day) as d0 from days),
    xy as (select cast(day - (select d0 from base) as bigint) as x, y
           from days),
    s as (select cast(count(*) as bigint) as n,
                 cast(sum(cast(x as decimal(38,0))) as decimal(38,0)) as sx,
                 cast(sum(cast(y as decimal(38,0))) as decimal(38,0)) as sy,
                 cast(sum(cast(x * y as decimal(38,0))) as decimal(38,0))
                   as sxy,
                 cast(sum(cast(x * x as decimal(38,0))) as decimal(38,0))
                   as sxx,
                 cast(sum(cast(y * y as decimal(38,0))) as decimal(38,0))
                   as syy
          from xy)
    select n,
           round((cast(n as double) * cast(sxy as double)
                  - cast(sx as double) * cast(sy as double))
                 / (cast(n as double) * cast(sxx as double)
                    - cast(sx as double) * cast(sx as double)),
                 6) as slope_per_day,
           round((cast(sy as double)
                  - ((cast(n as double) * cast(sxy as double)
                      - cast(sx as double) * cast(sy as double))
                     / (cast(n as double) * cast(sxx as double)
                        - cast(sx as double) * cast(sx as double)))
                    * cast(sx as double))
                 / cast(n as double),
                 6) as intercept,
           round(((cast(n as double) * cast(sxy as double)
                   - cast(sx as double) * cast(sy as double))
                  * (cast(n as double) * cast(sxy as double)
                     - cast(sx as double) * cast(sy as double)))
                 / ((cast(n as double) * cast(sxx as double)
                     - cast(sx as double) * cast(sx as double))
                    * (cast(n as double) * cast(syy as double)
                       - cast(sy as double) * cast(sy as double))),
                 6) as r2
    from s
"""

sql_case(
    "q175_ols_trend",
    _Q175_FIXED.replace("{EPOCHDAY}", _EPOCHDAY_SPARK),
    _Q175_FIXED.replace("{EPOCHDAY}", _EPOCHDAY_DUCK),
    doc="ordinary-least-squares trend of daily event volume: slope, "
    "intercept, and R^2 in closed form from decimal(38,0)-summed "
    "moments over the calendar-day table (x centered at day 0 keeps "
    "moments small and exact); every quotient one fixed IEEE "
    "sequence. The classical companion to q166's Theil-Sen median "
    "slope",
)


# ---------------------------------------------------------------------------
# q176 — Benford leading-digit screen over doc lengths: observed digit
# shares vs the Benford expectation with the chi-squared goodness-of-fit
# statistic. The fabricated-counts anomaly screen. Digits come from the
# bigint's string image (no float log10 near-boundary risk); Benford
# expectations are 9-digit decimal LITERALS, so no engine transcendental
# enters; per-digit terms round-9 then decimal-sum.
# ---------------------------------------------------------------------------

_Q176_BODY = """
    with v as (select cast(n_chars as bigint) as v
               from documents where n_chars is not null and n_chars >= 1),
    n as (select cast(count(*) as bigint) as n from v),
    o as (select cast(substr(cast(v as {STR}), 1, 1) as bigint) as digit,
                 cast(count(*) as bigint) as obs
          from v group by cast(substr(cast(v as {STR}), 1, 1) as bigint)),
    benford as (
      select 1 as digit, cast(0.301029996 as double) as p
      union all select 2, cast(0.176091259 as double)
      union all select 3, cast(0.124938737 as double)
      union all select 4, cast(0.096910013 as double)
      union all select 5, cast(0.079181246 as double)
      union all select 6, cast(0.066946790 as double)
      union all select 7, cast(0.057991947 as double)
      union all select 8, cast(0.051152522 as double)
      union all select 9, cast(0.045757491 as double)
    ),
    g as (
      select b.digit, b.p, coalesce(o.obs, 0) as obs, n.n
      from benford b left join o on o.digit = b.digit cross join n
    ),
    t as (
      select digit, obs, n,
             round(cast(n as double) * p, 6) as expected,
             cast(round(
               ((cast(obs as double) - cast(n as double) * p)
                * (cast(obs as double) - cast(n as double) * p))
               / (cast(n as double) * p), 9) as decimal(38,9)) as term
      from g
    ),
    chi as (select round(cast(sum(term) as double), 6) as chi2 from t)
    select t.digit, t.obs, t.expected,
           round(cast(t.obs as double) / cast(t.n as double), 6)
             as obs_share,
           chi.chi2
    from t cross join chi
    order by t.digit
"""

sql_case(
    "q176_benford_digits",
    _Q176_BODY.replace("{STR}", "string"),
    _Q176_BODY.replace("{STR}", "varchar"),
    doc="Benford leading-digit screen over doc lengths: digit from the "
    "bigint's string image (no float log10 boundary risk), expected "
    "shares as 9-digit decimal literals (no engine transcendental), "
    "chi-squared goodness-of-fit from round-9 decimal-summed terms, "
    "repeated beside each digit row. The fabricated-counts anomaly "
    "screen; reduces to a 9-row digit histogram before any float",
)


# ---------------------------------------------------------------------------
# q177 — chi-squared test of independence between lang and source, with
# Cramer's V. Where q153 measured H(lang | source) in bits, this is the
# significance-test view of the same contingency table — including the
# ZERO cells the raw group-by never emits (row x column grid, left join,
# coalesce 0). All marginals exact bigints; per-cell terms round-9 and
# decimal-sum; V = sqrt(chi2 / (N * min(r-1, c-1))).
# ---------------------------------------------------------------------------

_Q177_BODY = """
    with ct as (select lang, source, cast(count(*) as bigint) as o
                from documents
                where lang is not null and source is not null
                group by lang, source),
    rt as (select lang, cast(sum(o) as bigint) as r from ct group by lang),
    cl as (select source, cast(sum(o) as bigint) as c
           from ct group by source),
    n as (select cast(sum(o) as bigint) as n from ct),
    grid as (
      select rt.lang, cl.source, rt.r, cl.c, coalesce(ct.o, 0) as o
      from rt cross join cl
      left join ct on ct.lang = rt.lang and ct.source = cl.source
    ),
    t as (
      select cast(round(
               ((cast(o as double)
                 - (cast(r as double) * cast(c as double))
                   / cast((select n from n) as double))
                * (cast(o as double)
                   - (cast(r as double) * cast(c as double))
                     / cast((select n from n) as double)))
               / ((cast(r as double) * cast(c as double))
                  / cast((select n from n) as double)),
               9) as decimal(38,9)) as term
      from grid
    ),
    dims as (select cast(count(*) as bigint) as nr from rt),
    dimc as (select cast(count(*) as bigint) as nc from cl),
    chi as (select cast(sum(term) as decimal(38,9)) as chi2d from t)
    select round(cast(chi.chi2d as double), 6) as chi2,
           cast((dims.nr - 1) * (dimc.nc - 1) as bigint) as dof,
           n.n as n_docs,
           round(sqrt(cast(chi.chi2d as double)
                      / (cast(n.n as double)
                         * cast(least(dims.nr - 1, dimc.nc - 1) as double))),
                 6) as cramers_v
    from chi cross join dims cross join dimc cross join n
"""

sql_case(
    "q177_chi2_independence",
    _Q177_BODY,
    _Q177_BODY,
    doc="chi-squared independence test between lang and source with "
    "Cramer's V: the full row x column grid (zero cells included via "
    "left join + coalesce), exact bigint marginals, per-cell terms as "
    "fixed IEEE sequences rounded to 9 and decimal-summed, V = "
    "sqrt(chi2/(N*min(r-1,c-1))). The significance-test view of "
    "q153's conditional-entropy table; reduces to the contingency "
    "grid before any float",
)


# ---------------------------------------------------------------------------
# q178 — permutation entropy (order 3, Bandt-Pompe) of each event
# type's value series: the structureless-series screen. Consecutive
# value triples (two lag windows hash-partitioned by event_type,
# ordered by ts with event_id tiebreak) map to one of 6 ordinal
# patterns via a fixed CASE ladder whose <= comparisons break ties
# toward the earlier element (total order, both engines identical);
# H = -sum p ln p / ln 6 from round-6 decimal-summed terms. At 100 TB
# a hot event_type would sub-bucket by (type, day) with boundary
# stitching, exactly as q82's as-of does.
# ---------------------------------------------------------------------------

_Q178_BODY = """
    with e as (
      select event_type, value as c0,
             lag(value, 1) over (partition by event_type
                                 order by ts, event_id) as c1,
             lag(value, 2) over (partition by event_type
                                 order by ts, event_id) as c2
      from events
      where value is not null and not isnan(value)
    ),
    pat as (
      select event_type,
             case
               when c2 <= c1 and c1 <= c0 then 'abc'
               when c2 <= c1 and c2 <= c0 then 'acb'
               when c2 <= c0 then 'bac'
               when c1 <= c0 then 'bca'
               when c2 <= c1 then 'cab'
               else 'cba'
             end as pattern
      from e where c2 is not null
    ),
    pc as (select event_type, pattern, cast(count(*) as bigint) as c
           from pat group by event_type, pattern),
    tot as (select event_type, cast(sum(c) as bigint) as t
            from pc group by event_type),
    terms as (
      select pc.event_type, tot.t,
             cast(round(
               -(cast(pc.c as double) / cast(tot.t as double))
               * ln(cast(pc.c as double) / cast(tot.t as double))
               / ln(cast(6 as double)), 6) as decimal(38,6)) as term
      from pc join tot on tot.event_type = pc.event_type
    )
    select event_type,
           cast(min(t) as bigint) as n_triples,
           cast(count(*) as bigint) as n_patterns,
           round(cast(sum(term) as double), 6) as perm_entropy
    from terms
    group by event_type
    order by event_type
"""

sql_case(
    "q178_permutation_entropy",
    _Q178_BODY,
    _Q178_BODY,
    doc="order-3 Bandt-Pompe permutation entropy of each event type's "
    "value series: two lag windows hash-partitioned by event_type "
    "(ts + event_id total order), a fixed CASE ladder mapping each "
    "triple to one of 6 ordinal patterns with ties broken toward the "
    "earlier element, H normalized by ln 6 from round-6 decimal-"
    "summed terms. Near 1 = structureless noise, near 0 = "
    "deterministic motion — the series-structure screen beside "
    "q167's ACF",
)


# ---------------------------------------------------------------------------
# q179-q181 — the score-calibration audit family: does a heuristic quality
# score actually predict the outcome we filter on? The score here is the
# consonant-density heuristic (vowel-stripped length / length, a crude
# language-ness signal with real spread on this corpus) bucketed to 64
# levels; the
# binary outcome is lang = 'en'. q179 fits the isotonic (PAV) calibration
# curve via the minimax characterization; q180 draws the cumulative-gains
# curve a pruning budget reads; q181 picks the Youden-J operating
# threshold. All three reduce the corpus to ONE <= 64-row (bucket, n,
# positives) histogram (a single aggregation, checkpointed on the Spark
# side so the bounded O(B^2)/O(B^3) join solves never rescan the corpus);
# every rate is a fixed IEEE division of exact bigints, so both engines
# produce identical doubles and min/max/argmax agree bit-for-bit.
# ---------------------------------------------------------------------------

_CAL_HIST = """
    select b, cast(count(*) as bigint) as n, cast(sum(pos) as bigint) as s
    from (
      select case when lang = 'en' then 1 else 0 end as pos,
             least(63, cast(floor(64.0
               * (cast(length({LETTERS}) as double)
                  / cast(greatest(length(text), 1) as double)))
               as bigint)) as b
      from documents where text is not null and lang is not null
    ) t
    group by b
"""

_LETTERS_SPARK = "regexp_replace(text, '[aeiou]', '')"
_LETTERS_DUCK = "regexp_replace(text, '[aeiou]', '', 'g')"

# PAV via the minimax formula: fitted[i] = max_{j<=i} min_{k>=i} mean(j..k)
# — closed-form, no iteration, exact over the bounded histogram.
_Q179_FINAL = """
    with hist as (select * from {H}),
    cum as (
      select h1.b, cast(sum(h2.n) as bigint) as cn,
             cast(sum(h2.s) as bigint) as cs
      from hist h1 join hist h2 on h2.b <= h1.b
      group by h1.b
    ),
    cumlt as (
      select h1.b, cast(coalesce(sum(h2.n), 0) as bigint) as lt_n,
             cast(coalesce(sum(h2.s), 0) as bigint) as lt_s
      from hist h1 left join hist h2 on h2.b < h1.b
      group by h1.b
    ),
    pairs as (
      select /*+ BROADCAST(jl) */ jl.b as bj, ck.b as bk,
             cast(ck.cs - jl.lt_s as double)
               / cast(ck.cn - jl.lt_n as double) as m
      from cum ck join cumlt jl on jl.b <= ck.b
    ),
    mins as (
      select /*+ BROADCAST(i) */ p.bj, i.b as bi, min(p.m) as mn
      from pairs p join hist i on p.bj <= i.b and i.b <= p.bk
      group by p.bj, i.b
    ),
    fit as (select bi as b, max(mn) as fitted from mins group by bi)
    select h.b as score_bucket, h.n as n_docs, h.s as n_pos,
           round(cast(h.s as double) / cast(h.n as double), 6) as raw_rate,
           round(f.fitted, 6) as isotonic_rate
    from hist h join fit f on f.b = h.b
    order by h.b
"""


def _q179_spark(spark: SparkSession, sf_dir: str) -> DataFrame:
    load_tables(spark, sf_dir, names=("documents",))
    h = spark.sql(_CAL_HIST.replace("{LETTERS}", _LETTERS_SPARK)).localCheckpoint()
    h.createOrReplaceTempView("__q179_h__")
    return spark.sql(_Q179_FINAL.replace("{H}", "__q179_h__"))


register(
    "q179_isotonic_calibration",
    _Q179_FINAL.replace(
        "{H}", "(" + _CAL_HIST.replace("{LETTERS}", _LETTERS_DUCK) + ")"
    ),
    doc="isotonic (PAV) calibration of the consonant-density quality score "
    "against the lang='en' outcome, via the closed-form minimax "
    "characterization fitted[i] = max_{j<=i} min_{k>=i} mean(j..k) "
    "over the checkpointed <= 64-bucket histogram — the monotone "
    "recalibration map beside q143's reliability bins. Bucket means "
    "are fixed IEEE divisions of exact bigint cumulative sums, so "
    "min/max agree across engines bit-for-bit",
)(_q179_spark)


_Q180_FINAL = """
    with hist as (select * from {H}),
    tot as (select cast(sum(n) as bigint) as tn,
                   cast(sum(s) as bigint) as ts from hist),
    cum as (
      select h1.b, cast(sum(h2.n) as bigint) as cn,
             cast(sum(h2.s) as bigint) as cs
      from hist h1 join hist h2 on h2.b >= h1.b
      group by h1.b
    )
    select c.b as score_bucket, c.cn as docs_kept, c.cs as pos_kept,
           round(cast(c.cn as double) / cast(t.tn as double), 6)
             as frac_scanned,
           round(cast(c.cs as double) / cast(t.ts as double), 6) as gain,
           round((cast(c.cs as double) * cast(t.tn as double))
                 / (cast(c.cn as double) * cast(t.ts as double)), 6) as lift
    from cum c cross join tot t
    order by c.b desc
"""


def _q180_spark(spark: SparkSession, sf_dir: str) -> DataFrame:
    load_tables(spark, sf_dir, names=("documents",))
    h = spark.sql(_CAL_HIST.replace("{LETTERS}", _LETTERS_SPARK)).localCheckpoint()
    h.createOrReplaceTempView("__q180_h__")
    return spark.sql(_Q180_FINAL.replace("{H}", "__q180_h__"))


register(
    "q180_cumulative_gains",
    _Q180_FINAL.replace(
        "{H}", "(" + _CAL_HIST.replace("{LETTERS}", _LETTERS_DUCK) + ")"
    ),
    doc="cumulative-gains / lift curve of the consonant-density score against "
    "lang='en': keep buckets best-first and report the fraction of "
    "positives captured vs fraction of corpus kept, plus lift — the "
    "curve a pruning budget reads to pick its keep-rate. Bounded "
    "suffix-cumulative joins over the checkpointed histogram; exact "
    "bigint counts, rates as fixed IEEE divisions",
)(_q180_spark)


_Q181_FINAL = """
    with hist as (select * from {H}),
    tot as (select cast(sum(s) as bigint) as tp_all,
                   cast(sum(n - s) as bigint) as tn_all from hist),
    cum as (
      select h1.b, cast(sum(h2.s) as bigint) as tp,
             cast(sum(h2.n - h2.s) as bigint) as fp
      from hist h1 join hist h2 on h2.b >= h1.b
      group by h1.b
    )
    select c.b as threshold_bucket, c.tp, c.fp,
           round(cast(c.tp as double) / cast(t.tp_all as double), 6) as tpr,
           round(cast(c.fp as double) / cast(t.tn_all as double), 6) as fpr,
           round(cast(c.tp as double) / cast(t.tp_all as double)
                 - cast(c.fp as double) / cast(t.tn_all as double), 6)
             as youden_j
    from cum c cross join tot t
    order by cast(c.tp as double) / cast(t.tp_all as double)
             - cast(c.fp as double) / cast(t.tn_all as double) desc, c.b
    limit 1
"""


def _q181_spark(spark: SparkSession, sf_dir: str) -> DataFrame:
    load_tables(spark, sf_dir, names=("documents",))
    h = spark.sql(_CAL_HIST.replace("{LETTERS}", _LETTERS_SPARK)).localCheckpoint()
    h.createOrReplaceTempView("__q181_h__")
    return spark.sql(_Q181_FINAL.replace("{H}", "__q181_h__"))


register(
    "q181_youden_threshold",
    _Q181_FINAL.replace(
        "{H}", "(" + _CAL_HIST.replace("{LETTERS}", _LETTERS_DUCK) + ")"
    ),
    doc="Youden-J optimal operating threshold for the consonant-density score "
    "vs lang='en': the bucket maximizing TPR - FPR over suffix-"
    "cumulative confusion counts, argmax ordered on the unrounded "
    "statistic with a bucket tiebreak (identical doubles on both "
    "engines make the argmax deterministic). The single-number "
    "companion to q180's full curve",
)(_q181_spark)


# ---------------------------------------------------------------------------
# q182 — Kaplan-Meier time-to-conversion survival with right-censoring:
# the survival-analysis primitive q119's cohort matrix cannot give. The
# duration is days from a user's FIRST event to their FIRST 'purchase'
# event; users who never purchase are right-censored at the end of the
# observation window (alive in the "not yet converted" state). S(t) =
# prod over conversion times t_i <= t of (1 - d_i / n_i), censored users
# at risk through their censor time — the standard KM estimator. The
# corpus reduces to a per-user (duration, converted) table and then to a
# distinct-duration histogram (calendar-bounded — durations are day
# counts, never user counts), so at-risk counts and the cumulative
# product run over bounded join-cums: no windows, no iteration. Exact
# bigint (conversions, at_risk) are the primary columns; survival
# follows the libm recipe (round-9 ln terms decimal-summed, one exp,
# round 6), with an exact zero-flag short-circuiting S = 0 once any
# d_i = n_i.
# ---------------------------------------------------------------------------

_Q182_HIST = """
    with bounds as (select max({EPOCHDAY}) as obs_end from events),
    f as (select user_id, min({EPOCHDAY}) as d0
          from events where user_id is not null group by user_id),
    c as (select user_id, min({EPOCHDAY}) as dc
          from events
          where user_id is not null and event_type = 'purchase'
          group by user_id),
    lab as (
      select case when c.dc is not null
                  then cast(c.dc - f.d0 as bigint)
                  else cast((select obs_end from bounds) - f.d0 as bigint)
             end as duration,
             case when c.dc is not null then 1 else 0 end as died
      from f left join c on c.user_id = f.user_id
    )
    select duration, cast(count(*) as bigint) as total,
           cast(sum(died) as bigint) as deaths
    from lab group by duration
"""

_Q182_FINAL = """
    with km as (select * from {KM}),
    risk as (
      select /*+ BROADCAST(k2) */ k1.duration, k1.deaths,
             cast(sum(k2.total) as bigint) as at_risk
      from km k1 join km k2 on k2.duration >= k1.duration
      where k1.deaths > 0
      group by k1.duration, k1.deaths
    ),
    terms as (
      select duration, deaths, at_risk,
             case when deaths = at_risk then cast(1 as bigint)
                  else cast(0 as bigint) end as hits_zero,
             case when deaths = at_risk then cast(0 as decimal(38,9))
                  else cast(round(ln(
                         cast(at_risk - deaths as double)
                         / cast(at_risk as double)), 9)
                       as decimal(38,9)) end as lnterm
      from risk
    ),
    cum as (
      select /*+ BROADCAST(t2) */ t1.duration, t1.deaths, t1.at_risk,
             cast(sum(t2.lnterm) as decimal(38,9)) as lnsum,
             cast(max(t2.hits_zero) as bigint) as zeroed
      from terms t1 join terms t2 on t2.duration <= t1.duration
      group by t1.duration, t1.deaths, t1.at_risk
    )
    select duration as days_to_convert, deaths as conversions, at_risk,
           case when zeroed = 1 then cast(0.0 as double)
                else round(exp(cast(lnsum as double)), 6) end as survival
    from cum
    order by duration
"""


def _q182_spark(spark: SparkSession, sf_dir: str) -> DataFrame:
    load_tables(spark, sf_dir, names=("events",))
    km = spark.sql(
        _Q182_HIST.replace("{EPOCHDAY}", _EPOCHDAY_SPARK)
    ).localCheckpoint()
    km.createOrReplaceTempView("__q182_km__")
    return spark.sql(_Q182_FINAL.replace("{KM}", "__q182_km__"))


register(
    "q182_kaplan_meier",
    _Q182_FINAL.replace(
        "{KM}", "(" + _Q182_HIST.replace("{EPOCHDAY}", _EPOCHDAY_DUCK) + ")"
    ),
    doc="Kaplan-Meier time-to-conversion survival (days from a user's "
    "first event to their first purchase), right-censoring users who "
    "never convert at the observation end: S(t) = prod(1 - d_i/n_i) "
    "over conversion times, censored users at risk through their "
    "censor time. Calendar-bounded distinct-duration histogram, "
    "join-cums (no windows), exact bigint conversions/at-risk "
    "primary, survival via round-9 decimal-summed ln terms and one "
    "exp, exact zero short-circuit when d_i = n_i. The time-to-event "
    "curve q119's cohort matrix can't give. The duration histogram "
    "is checkpointed so the bounded join-cums never rescan events",
)(_q182_spark)


# ---------------------------------------------------------------------------
# q183 — log-rank test between the two md5 A/B arms' time-to-conversion
# survival curves: does the treatment arm convert FASTER, accounting for
# censoring? The inference companion to q182 (which draws one curve) and
# q160 (which compares final rates, ignoring time and censoring). At each
# death time: O1 = observed arm-1 conversions (exact bigint), E1 =
# d * n1 / n expected under the null, V = hypergeometric variance;
# chi2 = (O1 - E1)^2 / V. The per-(arm, duration) histogram is calendar-
# bounded and checkpointed; everything downstream is bounded join-cums.
# E1/V terms are fixed IEEE sequences rounded to 9 and decimal-summed.
# ---------------------------------------------------------------------------

_Q183_HIST = """
    with bounds as (select max({EPOCHDAY}) as obs_end from events),
    f as (select user_id, {UHASH} % 2 as arm, min({EPOCHDAY}) as d0
          from events where user_id is not null group by user_id),
    c as (select user_id, min({EPOCHDAY}) as dc
          from events
          where user_id is not null and event_type = 'purchase'
          group by user_id),
    lab as (
      select f.arm,
             case when c.dc is not null
                  then cast(c.dc - f.d0 as bigint)
                  else cast((select obs_end from bounds) - f.d0 as bigint)
             end as duration,
             case when c.dc is not null then 1 else 0 end as died
      from f left join c on c.user_id = f.user_id
    )
    select arm, duration, cast(count(*) as bigint) as total,
           cast(sum(died) as bigint) as deaths
    from lab group by arm, duration
"""

_Q183_FINAL = """
    with km as (select * from {KM}),
    dt_ as (select duration from km group by duration
            having sum(deaths) > 0),
    r as (
      select d.duration,
             cast(sum(k.total) as bigint) as n,
             cast(sum(case when k.arm = 1 then k.total else 0 end)
               as bigint) as n1,
             cast(sum(case when k.duration = d.duration then k.deaths
                           else 0 end) as bigint) as d_tot,
             cast(sum(case when k.duration = d.duration and k.arm = 1
                           then k.deaths else 0 end) as bigint) as d1
      from dt_ d join km k on k.duration >= d.duration
      group by d.duration
    ),
    terms as (
      select d1,
             cast(round(cast(d_tot as double) * cast(n1 as double)
                        / cast(n as double), 9) as decimal(38,9)) as e1,
             case when n > 1 then
               cast(round(
                 (cast(d_tot as double) * cast(n1 as double)
                  * cast(n - n1 as double) * cast(n - d_tot as double))
                 / (cast(n as double) * cast(n as double)
                    * cast(n - 1 as double)), 9) as decimal(38,9))
             else cast(0 as decimal(38,9)) end as v
      from r
    ),
    s as (
      select cast(count(*) as bigint) as n_times,
             cast(coalesce(sum(d1), 0) as bigint) as o1,
             cast(coalesce(sum(e1), 0) as decimal(38,9)) as e1d,
             cast(coalesce(sum(v), 0) as decimal(38,9)) as vd
      from terms
    )
    select n_times, o1,
           round(cast(e1d as double), 6) as e1,
           round(cast(vd as double), 6) as variance,
           round(((cast(o1 as double) - cast(e1d as double))
                  * (cast(o1 as double) - cast(e1d as double)))
                 / nullif(cast(vd as double), 0.0), 6) as logrank_chi2
    from s
"""


def _q183_spark(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .queries_ranking import _UHASH_SPARK

    load_tables(spark, sf_dir, names=("events",))
    km = spark.sql(
        _Q183_HIST.replace("{EPOCHDAY}", _EPOCHDAY_SPARK).replace(
            "{UHASH}", _UHASH_SPARK
        )
    ).localCheckpoint()
    km.createOrReplaceTempView("__q183_km__")
    return spark.sql(_Q183_FINAL.replace("{KM}", "__q183_km__"))


def _q183_oracle() -> str:
    from .queries_ranking import _UHASH_DUCK

    return _Q183_FINAL.replace(
        "{KM}",
        "("
        + _Q183_HIST.replace("{EPOCHDAY}", _EPOCHDAY_DUCK).replace(
            "{UHASH}", _UHASH_DUCK
        )
        + ")",
    )


register(
    "q183_logrank_test",
    _q183_oracle(),
    doc="log-rank test between the md5 A/B arms' time-to-conversion "
    "survival curves (censoring-aware, unlike q160's final-rate z): "
    "O1 exact bigint, E1 = d*n1/n and the hypergeometric variance as "
    "round-9 decimal-summed IEEE terms over the checkpointed "
    "calendar-bounded (arm, duration) histogram, chi2 = (O1-E1)^2/V "
    "with a nullif guard for the single-arm degenerate case",
)(_q183_spark)


# ---------------------------------------------------------------------------
# q184 — ROC AUC of the consonant-density score vs lang='en', as an exact
# rank-sum over the calibration histogram: 2U = sum over buckets of
# pos_b * (2 * negatives_strictly_below + neg_b) (ties count half), so
# AUC = U / (P * N) is a single fixed IEEE division of exact bigints.
# The global ranking-quality number beside q181's single operating point;
# Gini = 2*AUC - 1 rides along. Same bounded-histogram shape as q179.
# ---------------------------------------------------------------------------

_Q184_FINAL = """
    with hist as (select * from {H}),
    neglt as (
      select h1.b,
             cast(coalesce(sum(h2.n - h2.s), 0) as bigint) as neg_below
      from hist h1 left join hist h2 on h2.b < h1.b
      group by h1.b
    ),
    tot as (select cast(sum(s) as bigint) as p_total,
                   cast(sum(n - s) as bigint) as n_total from hist),
    u as (
      select cast(sum(h.s * (2 * g.neg_below + (h.n - h.s))) as bigint)
        as u2
      from hist h join neglt g on g.b = h.b
    )
    select t.p_total, t.n_total, u.u2,
           round(cast(u.u2 as double)
                 / (2.0 * (cast(t.p_total as double)
                           * cast(t.n_total as double))), 6) as auc,
           round(cast(u.u2 as double)
                 / (cast(t.p_total as double) * cast(t.n_total as double))
                 - 1.0, 6) as gini
    from u cross join tot t
"""


def _q184_spark(spark: SparkSession, sf_dir: str) -> DataFrame:
    load_tables(spark, sf_dir, names=("documents",))
    h = spark.sql(_CAL_HIST.replace("{LETTERS}", _LETTERS_SPARK)).localCheckpoint()
    h.createOrReplaceTempView("__q184_h__")
    return spark.sql(_Q184_FINAL.replace("{H}", "__q184_h__"))


register(
    "q184_roc_auc",
    _Q184_FINAL.replace(
        "{H}", "(" + _CAL_HIST.replace("{LETTERS}", _LETTERS_DUCK) + ")"
    ),
    doc="ROC AUC of the consonant-density score vs lang='en' as an exact "
    "rank-sum over the calibration histogram (2U carried as a bigint, "
    "within-bucket ties counting half), plus Gini = 2*AUC - 1 — the "
    "global ranking-quality number beside q181's single operating "
    "point. One corpus aggregation, bounded join-cums, one IEEE "
    "division",
)(_q184_spark)


# ---------------------------------------------------------------------------
# q185 — Murphy decomposition of the Brier score over the calibration
# histogram, with the bucket midpoint (2b+1)/128 as the forecast
# probability: reliability (forecast-vs-observed gap, what q179
# recalibrates away), resolution (how much the buckets separate
# outcomes), and uncertainty (the outcome's own variance);
# brier = reliability - resolution + uncertainty. Per-bucket terms are
# fixed IEEE sequences rounded to 9 and decimal-summed; the identity is
# exact up to those roundings.
# ---------------------------------------------------------------------------

_Q185_FINAL = """
    with hist as (select * from {H}),
    tot as (select cast(sum(n) as bigint) as nn,
                   cast(sum(s) as bigint) as ss from hist),
    terms as (
      select
        cast(round(cast(h.n as double)
          * (cast(2 * h.b + 1 as double) / 128.0
             - cast(h.s as double) / cast(h.n as double))
          * (cast(2 * h.b + 1 as double) / 128.0
             - cast(h.s as double) / cast(h.n as double)), 9)
          as decimal(38,9)) as rel_term,
        cast(round(cast(h.n as double)
          * (cast(h.s as double) / cast(h.n as double)
             - cast(t.ss as double) / cast(t.nn as double))
          * (cast(h.s as double) / cast(h.n as double)
             - cast(t.ss as double) / cast(t.nn as double)), 9)
          as decimal(38,9)) as res_term
      from hist h cross join tot t
    ),
    s as (
      select cast(sum(rel_term) as decimal(38,9)) as rel,
             cast(sum(res_term) as decimal(38,9)) as res
      from terms
    )
    select t.nn as n_docs,
           round(cast(t.ss as double) / cast(t.nn as double), 6)
             as base_rate,
           round(cast(s.rel as double) / cast(t.nn as double), 6)
             as reliability,
           round(cast(s.res as double) / cast(t.nn as double), 6)
             as resolution,
           round((cast(t.ss as double) / cast(t.nn as double))
                 * (1.0 - cast(t.ss as double) / cast(t.nn as double)), 6)
             as uncertainty,
           round(cast(s.rel as double) / cast(t.nn as double)
                 - cast(s.res as double) / cast(t.nn as double)
                 + (cast(t.ss as double) / cast(t.nn as double))
                   * (1.0 - cast(t.ss as double) / cast(t.nn as double)),
                 6) as brier
    from s cross join tot t
"""


def _q185_spark(spark: SparkSession, sf_dir: str) -> DataFrame:
    load_tables(spark, sf_dir, names=("documents",))
    h = spark.sql(_CAL_HIST.replace("{LETTERS}", _LETTERS_SPARK)).localCheckpoint()
    h.createOrReplaceTempView("__q185_h__")
    return spark.sql(_Q185_FINAL.replace("{H}", "__q185_h__"))


register(
    "q185_brier_decomposition",
    _Q185_FINAL.replace(
        "{H}", "(" + _CAL_HIST.replace("{LETTERS}", _LETTERS_DUCK) + ")"
    ),
    doc="Murphy decomposition of the Brier score over the calibration "
    "histogram (bucket midpoints as forecasts): reliability - "
    "resolution + uncertainty = brier. Round-9 decimal-summed IEEE "
    "terms over the checkpointed <= 64-bucket table; the calibration-"
    "quality summary q179 fixes and q180/q181 operate on",
)(_q185_spark)


# ---------------------------------------------------------------------------
# q186 — CUPED variance reduction audit: how much experiment variance the
# pre-period covariate removes. Each user's activity value-mass splits at
# the observation midpoint into (pre, post); theta = cov(pre, post) /
# var(pre) is the CUPED adjustment coefficient and rho^2 the fraction of
# post-period variance it removes (adjusted variance = (1 - rho^2) ×
# raw). Values quantize to exact micro-units per event, per-user sums are
# bigints, moments go through decimal(19,0)-cast products into
# decimal(38,0) (the q162 recipe), and only the final theta / rho^2
# quotients are doubles — bit-identical cross-engine. One corpus scan,
# one user_id shuffle, a 1-row moment table.
# ---------------------------------------------------------------------------

_Q186_BODY = """
    with days as (
      select user_id, {EPOCHDAY} as day,
             cast(round(value * 1000000.0) as bigint) as micro
      from events
      where user_id is not null and value is not null and not isnan(value)
    ),
    b as (select min(day) as d0, max(day) as d1 from days),
    sp as (select d0 + ((d1 - d0 + 1) {IDIV} 2) as split from b),
    u as (
      select user_id,
             cast(sum(case when day < sp.split
                           then micro else 0 end) as bigint) as pre,
             cast(sum(case when day >= sp.split
                           then micro else 0 end) as bigint) as post
      from days cross join sp group by user_id
    ),
    s as (
      select cast(count(*) as bigint) as n,
             cast(sum(cast(pre as decimal(19,0))) as decimal(38,0)) as sx,
             cast(sum(cast(post as decimal(19,0))) as decimal(38,0)) as sy,
             cast(sum(cast(pre as decimal(19,0)) * post) as decimal(38,0))
               as sxy,
             cast(sum(cast(pre as decimal(19,0)) * pre) as decimal(38,0))
               as sxx,
             cast(sum(cast(post as decimal(19,0)) * post) as decimal(38,0))
               as syy
      from s0
    ),
    s0 as (select pre, post from u)
    select n as n_users,
           round(cast(cast(n as decimal(19,0)) * sxy - sx * sy as double)
                 / nullif(cast(cast(n as decimal(19,0)) * sxx - sx * sx
                               as double), 0.0), 6) as theta,
           round((cast(cast(n as decimal(19,0)) * sxy - sx * sy as double)
                  * cast(cast(n as decimal(19,0)) * sxy - sx * sy as double))
                 / nullif(cast(cast(n as decimal(19,0)) * sxx - sx * sx
                               as double)
                          * cast(cast(n as decimal(19,0)) * syy - sy * sy
                                 as double), 0.0), 6) as rho2
    from s
"""


def _q186_sql(epochday: str, idiv: str) -> str:
    # DuckDB requires s0 defined before s; Spark accepts either — emit
    # the DuckDB-legal ordering for both
    body = _Q186_BODY.replace("{EPOCHDAY}", epochday).replace("{IDIV}", idiv)
    s0 = "    s0 as (select pre, post from u)"
    assert body.count(s0) == 1
    body = body.replace(",\n" + s0, "")
    return body.replace(
        "    s as (",
        s0 + ",\n    s as (",
    )


sql_case(
    "q186_cuped_reduction",
    _q186_sql(_EPOCHDAY_SPARK, "div"),
    _q186_sql(_EPOCHDAY_DUCK, "//"),
    doc="CUPED variance-reduction audit: per-user value mass split at the "
    "observation midpoint into (pre, post); theta = cov/var(pre) is "
    "the adjustment coefficient, rho^2 the post-period variance "
    "fraction it removes. Micro-unit exact per-event quantization, "
    "bigint user sums, decimal(19,0)-routed moment products, two "
    "final IEEE quotients with nullif zero-variance guards",
)


# ---------------------------------------------------------------------------
# q187 — minimum detectable effect per event type for the q160 A/B frame:
# the design-stage number that says whether the experiment as split can
# SEE an effect of interest (alpha = 0.05 two-sided, power = 0.8). z
# constants are decimal literals (no engine quantile function), the
# control rate and arm sizes are exact bigints, and the MDE is one fixed
# IEEE sequence — the audit that belongs beside q160's realized z and
# q183's censoring-aware comparison.
# ---------------------------------------------------------------------------

_Q187_BODY = """
    with t as (
      select event_type, {UHASH} % 2 as grp,
             case when value >= 100.0 then 1 else 0 end as conv
      from events
      where user_id is not null and value is not null and not isnan(value)
    ),
    a as (
      select event_type,
             cast(sum(case when grp = 0 then 1 else 0 end) as bigint) as na,
             cast(sum(case when grp = 0 then conv else 0 end) as bigint)
               as xa,
             cast(sum(case when grp = 1 then 1 else 0 end) as bigint) as nb
      from t group by event_type
    )
    select event_type, na, xa, nb,
           round(cast(xa as double) / cast(na as double), 6) as p0,
           round((1.959964 + 0.841621)
                 * sqrt(2.0 * (cast(xa as double) / cast(na as double))
                        * (1.0 - cast(xa as double) / cast(na as double))
                        / cast(nb as double)), 6) as mde_abs,
           round(((1.959964 + 0.841621)
                  * sqrt(2.0 * (cast(xa as double) / cast(na as double))
                         * (1.0 - cast(xa as double) / cast(na as double))
                         / cast(nb as double)))
                 / nullif(cast(xa as double) / cast(na as double), 0.0),
                 6) as mde_rel
    from a
    order by event_type
"""


def _q187_spark(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .queries_ranking import _UHASH_SPARK

    load_tables(spark, sf_dir, names=("events",))
    return spark.sql(_Q187_BODY.replace("{UHASH}", _UHASH_SPARK))


def _q187_oracle() -> str:
    from .queries_ranking import _UHASH_DUCK

    return _Q187_BODY.replace("{UHASH}", _UHASH_DUCK)


register(
    "q187_minimum_detectable_effect",
    _q187_oracle(),
    doc="minimum detectable effect per event type at alpha=0.05 two-sided "
    "/ power=0.8 over the md5 A/B arms: z constants as decimal "
    "literals, exact arm counts primary, MDE as one fixed IEEE "
    "sequence — the design-stage audit beside q160's realized z",
)(_q187_spark)
