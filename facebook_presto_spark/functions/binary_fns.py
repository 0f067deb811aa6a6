"""Binary / hash / URL / conditional function library.

Reference: presto-main/.../operator/scalar/VarbinaryFunctions.java (424 LoC),
HmacFunctions.java, UrlFunctions.java (193 LoC), TryFunction.java,
TryCastFunction.java, FailureFunction.java, SessionFunctions.java,
TypeOfFunction.java.
"""

from __future__ import annotations

import hashlib
import hmac as hmac_mod
import re
import urllib.parse

import pandas as pd

from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql.types import BinaryType, StringType

from facebook_presto_spark.functions.registry import register


def _c(x) -> Column:
    return F.col(x) if isinstance(x, str) else x


# --- hashes / encodings ----------------------------------------------------
# Presto digests return VARBINARY (VarbinaryFunctions.java:md5/sha*);
# Spark's builtins return lowercase hex strings — unhex back to bytes so
# to_hex(md5(x)) composes the way Presto users expect.
register("md5")(lambda b: F.unhex(F.md5(_c(b))))
register("sha1")(lambda b: F.unhex(F.sha1(_c(b))))
register("sha256")(lambda b: F.unhex(F.sha2(_c(b), 256)))
register("sha512")(lambda b: F.unhex(F.sha2(_c(b), 512)))
register("crc32")(lambda b: F.crc32(_c(b)))
register("xxhash64")(lambda *cols: F.xxhash64(*[_c(c) for c in cols]))
register("spooky_hash_v2_64")(lambda b: F.xxhash64(_c(b)))  # 64-bit stand-in
register("to_hex")(lambda b: F.upper(F.hex(_c(b))))
register("from_hex")(lambda s: F.unhex(_c(s)))
register("to_base64")(lambda b: F.base64(_c(b)))
register("from_base64")(lambda s: F.unbase64(_c(s)))
register("to_base64url")(
    lambda b: F.translate(F.base64(_c(b)), "+/", "-_")
)
register("from_base64url")(
    lambda s: F.unbase64(F.translate(_c(s), "-_", "+/"))
)
register("to_big_endian_64")(
    lambda x: F.unhex(F.lpad(F.hex(_c(x)), 16, "0"))
)
register("from_big_endian_64")(lambda b: F.conv(F.hex(_c(b)), 16, 10).cast("bigint"))


def _hmac(algo: str):
    # hmac_*(data, key) → VARBINARY — the reference's argument order is
    # MESSAGE first, key second (HmacFunctions.java:32-56
    # ``hmacSha256(Slice slice, Slice key)``); round 8 fixed a swapped
    # (key, data) spelling here.
    def build(data, key) -> Column:
        @F.pandas_udf(BinaryType())
        def _h(d: pd.Series, k: pd.Series) -> pd.Series:
            return pd.Series(
                [
                    None
                    if (kk is None or dd is None)
                    else hmac_mod.new(
                        kk.encode() if isinstance(kk, str) else bytes(kk),
                        dd.encode() if isinstance(dd, str) else bytes(dd),
                        algo,
                    ).digest()
                    for dd, kk in zip(d, k)
                ]
            )

        return _h(_c(data), _c(key))

    return build


register("hmac_md5", slow_path=True)(_hmac("md5"))
register("hmac_sha1", slow_path=True)(_hmac("sha1"))
register("hmac_sha256", slow_path=True)(_hmac("sha256"))
register("hmac_sha512", slow_path=True)(_hmac("sha512"))


# --- URL functions (UrlFunctions.java) -------------------------------------
register("url_extract_protocol")(lambda u: F.parse_url(_c(u), F.lit("PROTOCOL")))
register("url_extract_host")(lambda u: F.parse_url(_c(u), F.lit("HOST")))
register("url_extract_path")(lambda u: F.parse_url(_c(u), F.lit("PATH")))
register("url_extract_query")(lambda u: F.parse_url(_c(u), F.lit("QUERY")))
register("url_extract_fragment")(lambda u: F.parse_url(_c(u), F.lit("REF")))
register("url_extract_parameter")(
    lambda u, name: F.parse_url(_c(u), F.lit("QUERY"), F.lit(name) if isinstance(name, str) else _c(name))
)
@register("url_extract_port")
def url_extract_port(u) -> Column:
    port = F.regexp_extract(_c(u), r"^[a-zA-Z][a-zA-Z0-9+.-]*://[^/?#]*:(\d+)", 1)
    return F.nullif(port, F.lit("")).cast("bigint")


# module-level UDF objects so the engine can also register them for SQL
# text (engine.register_sql_udfs); the registry builders wrap the same ones
@F.pandas_udf(StringType())
def _url_encode_udf(col: pd.Series) -> pd.Series:
    return col.map(lambda v: None if v is None else urllib.parse.quote_plus(v))


@F.pandas_udf(StringType())
def _url_decode_udf(col: pd.Series) -> pd.Series:
    return col.map(lambda v: None if v is None else urllib.parse.unquote_plus(v))


register("url_encode", slow_path=True)(lambda s: _url_encode_udf(_c(s)))
register("url_decode", slow_path=True)(lambda s: _url_decode_udf(_c(s)))


@F.pandas_udf(StringType())
def _ipaddress_udf(col: pd.Series) -> pd.Series:
    # CAST(varchar AS IPADDRESS) canonical text form (IpAddressType.java);
    # NULL on invalid input (try_cast semantics — the reference raises)
    import ipaddress as ipmod

    def canon(v):
        if v is None:
            return None
        try:
            return str(ipmod.ip_address(v))
        except ValueError:
            return None

    return col.map(canon)


register("ipaddress", slow_path=True)(lambda s: _ipaddress_udf(_c(s)))

# name → UDF object, for SQL-level registration by the engine
def _hmac_sql_udf(algo: str):
    # SQL-path twin of _hmac below — hmac_*(data, key), reference order
    @F.pandas_udf(BinaryType())
    def _h(d: pd.Series, k: pd.Series) -> pd.Series:
        return pd.Series(
            [
                None
                if (kk is None or dd is None)
                else hmac_mod.new(
                    kk.encode() if isinstance(kk, str) else bytes(kk),
                    dd.encode() if isinstance(dd, str) else bytes(dd),
                    algo,
                ).digest()
                for dd, kk in zip(d, k)
            ]
        )

    return _h


SQL_UDFS = {
    "url_encode": _url_encode_udf,
    "url_decode": _url_decode_udf,
    "presto_ipaddress": _ipaddress_udf,
    # hmac + IEEE754 family: pandas-UDF-only (no JVM surface), so the
    # SQL path registers them directly (round 8)
    "hmac_md5": _hmac_sql_udf("md5"),
    "hmac_sha1": _hmac_sql_udf("sha1"),
    "hmac_sha256": _hmac_sql_udf("sha256"),
    "hmac_sha512": _hmac_sql_udf("sha512"),
}


# --- conditional / misc ----------------------------------------------------
register("if")(lambda cond, t, f=None: F.when(_c(cond), t).otherwise(f))
register("coalesce")(lambda *cols: F.coalesce(*[_c(c) for c in cols]))
register("nullif")(lambda a, b: F.nullif(_c(a), _c(b)))
register("try_cast")(lambda c, t: _c(c).try_cast(t))
register("typeof")(lambda c: F.typeof(_c(c)))
register("uuid")(lambda: F.uuid())
register("current_user")(lambda: F.current_user())


@register("try")
def try_(col) -> Column:
    """try(expr) (TryFunction.java): errors → NULL.  In Spark the safe
    variants are per-operation (try_cast/try_divide/try_add…); for an
    already-built column this is a pass-through marker — callers should
    build with the try_* variants below."""
    return _c(col)


register("try_divide")(lambda a, b: F.try_divide(_c(a), _c(b)))
register("try_add")(lambda a, b: F.try_add(_c(a), _c(b)))
register("try_subtract")(lambda a, b: F.try_subtract(_c(a), _c(b)))
register("try_multiply")(lambda a, b: F.try_multiply(_c(a), _c(b)))


@register("fail")
def fail(message: str) -> Column:
    """fail(msg) (FailureFunction.java) — raises at evaluation."""
    return F.raise_error(F.lit(message))


@register("parse_presto_data_size")
def parse_presto_data_size(s) -> Column:
    """'2.3MB' → bytes (DataSizeFunctions.java)."""
    s = _c(s)
    num = F.regexp_extract(s, r"^([0-9.]+)", 1).cast("double")
    unit = F.regexp_extract(s, r"([a-zA-Z]+)$", 1)
    mult = (
        F.when(unit == "B", 1.0)
        .when(unit == "kB", 1024.0)
        .when(unit == "MB", 1024.0 ** 2)
        .when(unit == "GB", 1024.0 ** 3)
        .when(unit == "TB", 1024.0 ** 4)
        .when(unit == "PB", 1024.0 ** 5)
    )
    return (num * mult).cast("decimal(38,0)")


# 32-bit big-endian + IEEE754 encode/decode (VarbinaryFunctions.java).
register("to_big_endian_32")(
    lambda x: F.unhex(
        F.lpad(F.hex(_c(x).cast("int").cast("bigint").bitwiseAND(F.lit(0xFFFFFFFF))), 8, "0")
    )
)
register("from_big_endian_32")(
    # reinterpret the 4 bytes as signed int32
    lambda b: ((F.conv(F.hex(_c(b)), 16, 10).cast("bigint") + F.lit(2**31)) % F.lit(2**32) - F.lit(2**31)).cast("int")
)


def _ieee754_udf(fmt: str, decode: bool, out_type):
    import struct

    from pyspark.sql.types import BinaryType, DoubleType, FloatType

    if decode:
        @F.pandas_udf(out_type)
        def _fn(s: pd.Series) -> pd.Series:
            return s.map(lambda b: None if b is None else struct.unpack(fmt, bytes(b))[0])
    else:
        @F.pandas_udf(BinaryType())
        def _fn(s: pd.Series) -> pd.Series:
            return s.map(lambda v: None if v is None else bytearray(struct.pack(fmt, v)))
    return _fn


@register("to_ieee754_64", slow_path=True)
def to_ieee754_64(x) -> Column:
    from pyspark.sql.types import DoubleType
    return _ieee754_udf(">d", False, DoubleType())(_c(x).cast("double"))


@register("from_ieee754_64", slow_path=True)
def from_ieee754_64(b) -> Column:
    from pyspark.sql.types import DoubleType
    return _ieee754_udf(">d", True, DoubleType())(_c(b))


@register("to_ieee754_32", slow_path=True)
def to_ieee754_32(x) -> Column:
    from pyspark.sql.types import FloatType
    return _ieee754_udf(">f", False, FloatType())(_c(x).cast("float"))


@register("from_ieee754_32", slow_path=True)
def from_ieee754_32(b) -> Column:
    from pyspark.sql.types import FloatType
    return _ieee754_udf(">f", True, FloatType())(_c(b))


def _register_ieee754_sql_udfs():
    from pyspark.sql.types import DoubleType, FloatType

    SQL_UDFS.update({
        "to_ieee754_64": _ieee754_udf(">d", False, DoubleType()),
        "from_ieee754_64": _ieee754_udf(">d", True, DoubleType()),
        "to_ieee754_32": _ieee754_udf(">f", False, FloatType()),
        "from_ieee754_32": _ieee754_udf(">f", True, FloatType()),
    })


_register_ieee754_sql_udfs()


# --- ANALYZE-internal data-size estimate ------------------------------------

def _parse_spark_type(s: str):
    """Parse Spark's typeof() rendering into (kind, children) for the
    size model below.  Handles array<…>, map<k,v>, struct<n:t,…>,
    decimal(p,s); everything else is a leaf."""
    s = s.strip()
    for tag in ("array", "map", "struct"):
        if s.startswith(tag + "<") and s.endswith(">"):
            body = s[len(tag) + 1:-1]
            parts, depth, start = [], 0, 0
            for i, ch in enumerate(body):
                if ch in "<(":
                    depth += 1
                elif ch in ">)":
                    depth -= 1
                elif ch == "," and depth == 0:
                    parts.append(body[start:i])
                    start = i + 1
            parts.append(body[start:])
            if tag == "struct":
                parts = [p.split(":", 1)[1] for p in parts]
            return (tag, [_parse_spark_type(p) for p in parts])
    if s.startswith("decimal"):
        m = re.match(r"decimal\((\d+)", s)
        return ("decimal", int(m.group(1)) if m else 38)
    return (s, None)


_STATS_FIXED_WIDTH = {
    "boolean": 1, "tinyint": 1, "smallint": 2, "int": 4, "integer": 4,
    "float": 4, "real": 4, "date": 4, "bigint": 8, "double": 8,
    "timestamp": 8, "timestamp_ntz": 8,
}


def _stats_size(v, t) -> int:
    """Per-value estimated data size, the reference's
    Block.getEstimatedDataSizeForStats model (SumDataSizeForStats.java /
    MaxDataSizeForStats.java test contract, AbstractTestAggregations
    .java:751-790): raw value bytes only — UTF-8 length for varchar,
    byte length for varbinary, the fixed physical width for primitives
    (int 4, bigint 8, …), and the recursive element sum for
    array/map/row with NO per-entry overhead."""
    if v is None:
        return 0
    kind, sub = t
    if kind == "array":
        return sum(_stats_size(e, sub[0]) for e in v)
    if kind == "map":
        return sum(_stats_size(k, sub[0]) + _stats_size(x, sub[1])
                   for k, x in v.items())
    if kind == "struct":
        return sum(_stats_size(f, ft) for f, ft in zip(v, sub))
    if kind in ("string", "varchar", "char"):
        return len(v.encode("utf-8"))
    if kind in ("binary", "varbinary"):
        return len(v)
    if kind == "decimal":
        return 8 if sub <= 18 else 16
    return _STATS_FIXED_WIDTH.get(kind, 8)


def _data_size_for_stats_udf():
    # row-at-a-time by design, like engine.presto_json_field: the size
    # model dispatches on the runtime type string and arbitrarily nested
    # Python values (Row/list/dict), and the only callers are the hidden
    # $internal$ ANALYZE aggregates — never a scan-path operator
    _cache: dict = {}

    def _sz(v, ts):
        t = _cache.get(ts)
        if t is None:
            t = _cache[ts] = _parse_spark_type(ts)
        return _stats_size(v, t)

    from pyspark.sql.types import LongType

    return F.udf(_sz, LongType())


SQL_UDFS["presto_data_size_for_stats"] = _data_size_for_stats_udf()
