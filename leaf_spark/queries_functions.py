"""Function-allowlist surface (SURVEY §2.B function table; reference
allowlist at leaf-stream/src/lib.rs:1104-1110).

Each case exercises the SQLite-dialect functions a module query may use,
written Spark-side in the translated form our sqlcompat layer produces, with
the DuckDB oracle written in (DuckDB's) SQLite-flavored spelling — so the
pair also documents the dialect mapping.
"""

from __future__ import annotations

from .queries import register, sql_case

# --- conditional: iif / coalesce / nullif / ifnull ---------------------------
sql_case(
    "q20_conditional",
    # Spark: iif → if, rest are shared names
    """
    select o_orderkey,
           if(o_totalprice > 150000, 'big', 'small') as bucket,
           coalesce(nullif(o_orderstatus, 'O'), 'OPEN') as status2,
           ifnull(nullif(o_orderpriority, '1-URGENT'), 'URGENT') as pri
    from orders
    where o_orderkey < 2000
    """,
    """
    select o_orderkey,
           case when o_totalprice > 150000 then 'big' else 'small' end as bucket,
           coalesce(nullif(o_orderstatus, 'O'), 'OPEN') as status2,
           ifnull(nullif(o_orderpriority, '1-URGENT'), 'URGENT') as pri
    from orders
    where o_orderkey < 2000
    """,
    doc="iif/coalesce/nullif/ifnull (SQLite conditional surface)",
)

# --- strings: length/substr/trim/upper/lower/replace/instr/printf ------------
sql_case(
    "q21_string_fns",
    """
    select p_partkey,
           length(p_name) as name_len,
           substring(p_name, 1, 8) as name8,
           upper(substring(p_name, 1, 4)) as name4_u,
           lower(p_brand) as brand_l,
           replace(p_type, ' ', '_') as type_u,
           instr(p_name, 'a') as first_a,
           trim('  ' || p_brand || '  ') as brand_trim,
           ltrim('xy', 'xxy' || p_brand) as brand_ltrim,
           format_string('%s#%d', p_brand, p_size) as tag
    from part
    where p_partkey <= 500
    """,
    """
    select p_partkey,
           length(p_name) as name_len,
           substring(p_name, 1, 8) as name8,
           upper(substring(p_name, 1, 4)) as name4_u,
           lower(p_brand) as brand_l,
           replace(p_type, ' ', '_') as type_u,
           instr(p_name, 'a') as first_a,
           trim('  ' || p_brand || '  ') as brand_trim,
           ltrim('xxy' || p_brand, 'xy') as brand_ltrim,
           printf('%s#%d', p_brand, p_size) as tag
    from part
    where p_partkey <= 500
    """,
    doc="string fn surface incl. printf→format_string",
)

# --- math: abs / round -------------------------------------------------------
sql_case(
    "q22_math",
    """
    select l_orderkey, l_linenumber,
           abs(l_discount - 0.05) as disc_dev,
           round(l_quantity) as qty_r,
           round(l_discount * 100) as disc_pct,
           cast(round(l_extendedprice) as bigint) as price_r
    from lineitem
    where l_orderkey < 400
    """,
    """
    select l_orderkey, l_linenumber,
           abs(l_discount - 0.05) as disc_dev,
           round(l_quantity) as qty_r,
           round(l_discount * 100) as disc_pct,
           cast(round(l_extendedprice) as bigint) as price_r
    from lineitem
    where l_orderkey < 400
    """,
    doc="abs/round (allowlist math)",
)

# --- date/time: strftime / date / unixepoch ----------------------------------
sql_case(
    "q23_datetime",
    """
    select o_orderkey,
           date_format(o_orderdate, 'yyyy-MM-dd') as d,
           date_format(o_orderdate, 'yyyy-MM') as ym,
           cast(year(o_orderdate) as int) as y,
           cast(month(o_orderdate) as int) as m,
           cast(unix_timestamp(o_orderdate) as bigint) as epoch_s
    from orders
    where o_orderkey < 2000
    """,
    """
    select o_orderkey,
           strftime(o_orderdate, '%Y-%m-%d') as d,
           strftime(o_orderdate, '%Y-%m') as ym,
           cast(year(o_orderdate) as int) as y,
           cast(month(o_orderdate) as int) as m,
           cast(epoch(o_orderdate) as bigint) as epoch_s
    from orders
    where o_orderkey < 2000
    """,
    doc="SQLite date/strftime/unixepoch surface → date_format/unix_timestamp",
)

# --- group_concat (SQLite is arrival-ordered → pin an explicit order) --------
sql_case(
    "q24_group_concat",
    """
    select n_name,
           array_join(sort_array(collect_list(cast(s_suppkey as string))), ',') as suppliers
    from supplier join nation on s_nationkey = n_nationkey
    group by n_name
    """,
    """
    select n_name,
           string_agg(cast(s_suppkey as varchar), ',' order by cast(s_suppkey as varchar)) as suppliers
    from supplier join nation on s_nationkey = n_nationkey
    group by n_name
    """,
    doc="group_concat → array_join(sort_array(collect_list)) with pinned order",
)

# --- total() — SQLite: sum that is 0.0 (not NULL) on empty input -------------
sql_case(
    "q25_total",
    """
    select event_type,
           coalesce(cast(sum(cast(value as decimal(38,6))) as double), 0.0) as total_value,
           coalesce(cast(sum(cast(if(value > 1e9, value, null) as decimal(38,6))) as double), 0.0) as total_huge
    from events
    group by event_type
    """,
    """
    select event_type,
           coalesce(cast(sum(cast(value as decimal(38,6))) as double), 0.0) as total_value,
           coalesce(cast(sum(cast(case when value > 1e9 then value end as decimal(38,6))) as double), 0.0) as total_huge
    from events
    group by event_type
    """,
    doc="total() → coalesce(sum(...), 0.0); all-NULL group yields 0.0",
)

# --- json: ->> extraction over events.props ----------------------------------
sql_case(
    "q26_json_extract",
    """
    select event_type,
           count(*) as n,
           cast(sum(cast(get_json_object(props, '$.k') as bigint)) as bigint) as k_sum,
           min(cast(get_json_object(props, '$.k') as bigint)) as k_min,
           max(cast(get_json_object(props, '$.k') as bigint)) as k_max
    from events
    group by event_type
    """,
    """
    select event_type,
           count(*) as n,
           cast(sum(cast(props->>'k' as bigint)) as bigint) as k_sum,
           min(cast(props->>'k' as bigint)) as k_min,
           max(cast(props->>'k' as bigint)) as k_max
    from events
    group by event_type
    """,
    doc="json ->> / json_extract → get_json_object",
)

# --- json_object construction ------------------------------------------------
sql_case(
    "q27_json_object",
    """
    select event_type,
           to_json(named_struct('type', event_type, 'n', count(*))) as j
    from events
    group by event_type
    """,
    """
    select event_type,
           cast(json_object('type', event_type, 'n', count(*)) as varchar) as j
    from events
    group by event_type
    """,
    doc="json_object → to_json(named_struct)",
)

# --- json_group_array with pinned order --------------------------------------
sql_case(
    "q28_json_group_array",
    """
    select user_id,
           to_json(sort_array(collect_list(named_struct('id', event_id)))) as ids
    from events
    where user_id < 40
    group by user_id
    """,
    """
    select user_id,
           cast(to_json(list(json_object('id', event_id) order by event_id)) as varchar) as ids
    from events
    where user_id < 40
    group by user_id
    """,
    doc="json_group_array → to_json(sort_array(collect_list(named_struct)))",
)

# --- LIKE + GLOB translation -------------------------------------------------
sql_case(
    "q29_like_glob",
    """
    select p_partkey, p_name
    from part
    where p_name like '%sky%'
       or p_name rlike '^m.*o.*$'
    """,
    """
    select p_partkey, p_name
    from part
    where p_name like '%sky%'
       or p_name glob 'm*o*'
    """,
    doc="LIKE shared; GLOB → anchored rlike translation",
)

# --- typeof (SQLite dynamic-type names) --------------------------------------
sql_case(
    "q37_typeof",
    # Spark: the sqlcompat typeof shim output (value-class names mapped to
    # SQLite's five: integer/real/text/blob/null)
    """
    select l_orderkey,
           case typeof(l_orderkey) when 'bigint' then 'integer'
                when 'int' then 'integer' when 'smallint' then 'integer'
                when 'double' then 'real' when 'float' then 'real'
                when 'string' then 'text' when 'binary' then 'blob'
                when 'void' then 'null' else typeof(l_orderkey) end as t_key,
           case typeof(l_quantity) when 'bigint' then 'integer'
                when 'double' then 'real' when 'float' then 'real'
                when 'string' then 'text' when 'void' then 'null'
                else typeof(l_quantity) end as t_qty,
           case typeof(l_returnflag) when 'string' then 'text'
                when 'void' then 'null' else typeof(l_returnflag) end as t_flag,
           case typeof(null) when 'void' then 'null' else 'x' end as t_null
    from lineitem where l_orderkey < 100
    """,
    """
    select l_orderkey,
           case lower(typeof(l_orderkey)) when 'bigint' then 'integer'
                when 'integer' then 'integer' else lower(typeof(l_orderkey)) end as t_key,
           case lower(typeof(l_quantity)) when 'double' then 'real'
                else lower(typeof(l_quantity)) end as t_qty,
           case lower(typeof(l_returnflag)) when 'varchar' then 'text'
                else lower(typeof(l_returnflag)) end as t_flag,
           case lower(typeof(NULL)) when '"null"' then 'null' else 'null' end as t_null
    from lineitem where l_orderkey < 100
    """,
    doc="typeof → SQLite dynamic-type names (integer/real/text/null shim)",
)

# --- json_set / json_patch (compat UDFs; SQLite semantics) -------------------


@register(
    "q38_json_set_patch",
    """
    select event_id,
           json_merge_patch(props, json_object('seen', true)) as patched,
           json_merge_patch(props, json_object('k2', json_extract(props, '$.k'))) as k2set
    from events where event_id < 50
    """,
    doc="json_patch (RFC-7386 merge) + json_set-style key add via compat UDFs",
)
def q38_json_set_patch(spark, sf_dir):
    from .session import load_tables
    from .sqlcompat import register_json_udfs

    load_tables(spark, sf_dir, names=("events",))
    register_json_udfs(spark)
    return spark.sql(
        """
        select event_id,
               json_patch(props, '{"seen":true}') as patched,
               json_set(props, '$.k2', cast(get_json_object(props, '$.k') as bigint)) as k2set
        from events where event_id < 50
        """
    )


# --- json_each (explode a JSON object to key/value rows) ---------------------
sql_case(
    "q39_json_each",
    """
    select event_id, key, value
    from (select event_id, explode(from_json(props, 'map<string,string>'))
          from events where event_id < 100)
    """,
    """
    select event_id, k as key, json_extract_string(props, '$.' || k) as value
    from events, unnest(json_keys(props)) as t(k)
    where event_id < 100
    """,
    doc="json_each → explode(from_json(... map)) key/value rows",
)
