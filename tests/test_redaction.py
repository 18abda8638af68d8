"""redact_pii (operators/redaction.py) — counts, replacement, contract."""

import re

from kg_microbe_spark.operators.redaction import PII_PATTERNS, redact_pii


CASES = [
    "mail me at alice.smith+spam@sub.domain.example today",
    "call 555-123-4567 or 555 987 6543",
    "server at 10.0.255.7 and 192.168.1.1 responded",
    "mixed: bob@x.io, 555-000-1111, 172.16.0.9",
    "nothing to redact here",
    "almost an email @ not.one; short phone 555-12-3456; bad ip 1.2.3",
]


def _py_redact(s):
    counts = {name: len(re.findall(pat, s)) for name, (pat, _) in PII_PATTERNS.items()}
    for _, (pat, token) in PII_PATTERNS.items():
        s = re.sub(pat, token, s)
    return counts, s


def test_redact_matches_python_re(spark):
    df = spark.createDataFrame([(i, s) for i, s in enumerate(CASES)], "i long, text string")
    rows = {r.i: r for r in redact_pii(df, "text").collect()}
    for i, s in enumerate(CASES):
        counts, red = _py_redact(s)
        r = rows[i]
        got = {"email": r.n_email, "phone": r.n_phone, "ipv4": r.n_ipv4}
        assert got == counts, (s, got, counts)
        assert r.redacted_text == red, (s, r.redacted_text, red)


def test_redact_no_shuffle(spark):
    df = spark.createDataFrame([(1, "a@b.co")], "i long, text string")
    plan = redact_pii(df, "text")._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan, plan
