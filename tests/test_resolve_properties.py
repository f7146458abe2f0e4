"""Property-based tests (hypothesis) for the placeholder resolver —
beyond the reference's example-based matrix: arbitrary literals with
escapes, arbitrary scalar types, random dependency chains.
"""

import string

from hypothesis import given, settings
from hypothesis import strategies as st

from xetl_spark.plans.models import Job

# text that contains no placeholder triggers at all
plain_text = st.text(
    alphabet=string.ascii_letters + string.digits + " _-./:",
    max_size=30,
)
scalars = st.one_of(
    st.integers(min_value=-(2**31), max_value=2**31),
    st.floats(allow_nan=False, allow_infinity=False, width=32),
    st.booleans(),
    plain_text,
)
var_names = st.text(alphabet=string.ascii_uppercase, min_size=1, max_size=8)


def _job(env):
    return Job(name="p", commands=[{"task": "noop", "env": env}])


@given(plain_text)
@settings(max_examples=60, deadline=None)
def test_plain_strings_pass_through(s):
    job = _job({"V": s})
    assert job.commands[0].env["V"] == s


@given(scalars)
@settings(max_examples=60, deadline=None)
def test_whole_match_identity(value):
    """X = any scalar; Y = "${X}" must reproduce X exactly, type
    included (reference whole-match type preservation)."""
    job = _job({"X": value, "Y": "${X}"})
    assert job.commands[0].env["Y"] == value or (
        job.commands[0].env["Y"] != job.commands[0].env["Y"]  # NaN-safe (excluded)
    )


@given(plain_text, plain_text)
@settings(max_examples=60, deadline=None)
def test_escape_roundtrip(prefix, suffix):
    """$$ always renders a single literal dollar, regardless of
    surrounding text."""
    job = _job({"S": f"{prefix}$${suffix}"})
    resolved = job.commands[0].env["S"]
    assert resolved == f"{prefix}${suffix}"


@given(var_names, scalars, plain_text.filter(lambda s: s != ""))
@settings(max_examples=60, deadline=None)
def test_embedded_substitution_stringifies(name, value, around):
    """Non-whole-match placeholders stringify (empty prefix would be the
    whole-match type-preserving case, tested separately)."""
    job = _job({name: value, "OUT": f"{around}${{{name}}}"})
    got = job.commands[0].env["OUT"]
    if name == "OUT":
        return  # self-reference: stays literal by design
    expected = f"{around}{value}"
    assert got == expected


@given(st.lists(scalars, min_size=1, max_size=6))
@settings(max_examples=40, deadline=None)
def test_chain_resolution(values):
    """V0 holds a scalar; each Vi = "${Vi-1}"; the whole chain must
    collapse to V0's value with type preserved."""
    env = {"V0": values[0]}
    for i in range(1, len(values)):
        env[f"V{i}"] = f"${{V{i-1}}}"
    job = _job(env)
    resolved = job.commands[0].env
    for i in range(1, len(values)):
        assert resolved[f"V{i}"] == values[0]


@given(var_names, var_names, plain_text)
@settings(max_examples=40, deadline=None)
def test_previous_and_named_agree(n1, n2, val):
    """${previous.env.X} and ${<name>.env.X} resolve identically when
    'previous' IS the named command."""
    if n1.lower() == "previous" or n1 == n2:
        return
    job = Job(
        name="p",
        commands=[
            {"name": n1, "task": "noop", "env": {"OUT": val}},
            {"task": "noop", "env": {"A": "${previous.env.OUT}", "B": f"${{{n1}.env.OUT}}"}},
        ],
    )
    env = job.commands[1].env
    assert env["A"] == env["B"] == val


# ---------------------------------------------------------------- operators


def test_asof_join_random_matches_merge_asof(spark):
    """Randomized as-of vs pandas merge_asof over many key/time shapes
    (single Spark job; data generated with a fixed-seed numpy RNG)."""
    import numpy as np
    import pandas as pd

    from xetl_spark.operators import asof_join

    rng = np.random.default_rng(11)
    for trial in range(5):
        n_l, n_r = rng.integers(1, 40), rng.integers(0, 40)
        lp = pd.DataFrame(
            {
                "k": rng.integers(0, 4, n_l),
                "ts": np.round(rng.uniform(0, 100, n_l), 3),
            }
        ).drop_duplicates(["k", "ts"])
        rp = pd.DataFrame(
            {
                "k": rng.integers(0, 4, max(n_r, 1)),
                "rts": np.round(rng.uniform(0, 100, max(n_r, 1)), 3),
                "v": [f"v{i}" for i in range(max(n_r, 1))],
            }
        ).drop_duplicates(["k", "rts"])
        left = spark.createDataFrame(lp.astype({"k": "int64"}))
        right = spark.createDataFrame(rp.astype({"k": "int64"}))
        got = (
            asof_join(left, right, on=["k"], left_ts="ts", right_ts="rts",
                      right_payload=["v"])
            .orderBy("k", "ts")
            .toPandas()
        )
        exp = pd.merge_asof(
            lp.sort_values("ts"), rp.sort_values("rts"),
            left_on="ts", right_on="rts", by="k",
        ).sort_values(["k", "ts"]).reset_index(drop=True)
        assert list(got["v_asof"].fillna("-")) == list(exp["v"].fillna("-")), trial
