"""Golden contract for the SQL path's Java Double.toString formatter.

`geo_sql._java_double_str` reimplements the legacy (pre-Ryū, < JDK 19)
jdk.internal.math.FloatingDecimal semantics that Spark's double→string
cast delegates to, so the SQL path's WKT coordinates match the Column
path byte-for-byte.  The reconstruction was validated against the host
JVM on ~940k fuzzed bit patterns and against Spark's cast on 80k values
(round 9); this suite pins 1,873 curated golden pairs covering every
dtoa path and boundary class — the integral fast path with
insignificant-digit discard, the 32/64-bit wrapping Steele-White loops
(half-ulp overflow stop, wrapped tie value), the exact big-integer path
with its inclusive high test, power-of-ten neighbors where Java's
log10 ESTIMATE sits one too high, subnormals, and the quarter-ulp
power-of-two hack.

Regenerate goldens (needs a JVM ≤ 18): feed the first column (raw IEEE
bit patterns) to Double.toString via
    long bits; Double.toString(Double.longBitsToDouble(bits))
and rewrite tests/goldens_java_double_str.tsv.
"""

import os
import struct

from facebook_presto_spark.functions.geo_sql import _java_double_str

GOLDENS = os.path.join(os.path.dirname(__file__),
                       "goldens_java_double_str.tsv")


def test_java_double_str_goldens():
    checked = 0
    bad = []
    with open(GOLDENS) as f:
        for line in f:
            if line.startswith("#"):
                continue
            bits_s, want = line.rstrip("\n").split("\t")
            v = struct.unpack("<d", struct.pack("<Q", int(bits_s)))[0]
            got = _java_double_str(v)
            if got != want:
                bad.append((bits_s, want, got))
            checked += 1
    assert checked > 1800
    assert not bad, f"{len(bad)}/{checked} mismatches, first 5: {bad[:5]}"


def test_java_double_str_specials():
    assert _java_double_str(float("nan")) == "NaN"
    assert _java_double_str(float("inf")) == "Infinity"
    assert _java_double_str(float("-inf")) == "-Infinity"
    assert _java_double_str(0.0) == "0.0"
    assert _java_double_str(-0.0) == "-0.0"
