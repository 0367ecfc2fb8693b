"""AUID tests — golden vectors verbatim from the reference's
/root/reference/tests/unit_tests/tests_auids.py."""

from dggstools_spark.dggs import auids


class TestEncodeDecode:
    def test_roundtrip_without_repetition(self):
        # reference tests_auids.py:17-37
        for cuids in (
            ["N11", "N12", "N2", "N3"],
            ["N1", "N21", "N22", "N23", "N25", "S12", "S13"],
            ["[1,(0,0)]2", "[1,(0,1)]2", "[1,(1,1)]2"],
            ["[1,(1,1)]1", "[1,(2,2)]2", "[1,(2,3)]2", "[1,(3,2)]2", "[1,(3,3)]2"],
            ["N(0,0)3", "N(1,0)1", "N(1,1)1", "N(3,1)2", "N(3,2)2", "N(0,7)3", "N(7,6)3",
             "N(12,5)4", "N(3,5)4", "N(6,5)4", "N(1,15)4", "N(7,7)4", "N(6,12)4",
             "N(9,8)4", "N(0,9)4"],
        ):
            bp = auids.generate_bp_auid_from_cuids(cuids)
            assert auids.generate_cuids_from_bp_auid(bp) == sorted(cuids)

    def test_repetitions_collapse(self):
        # reference tests_auids.py:39-49
        bp1 = auids.generate_bp_auid_from_cuids(["N1", "N1"])
        bp2 = auids.generate_bp_auid_from_cuids(["N1"])
        assert auids.generate_cuids_from_bp_auid(bp1) == auids.generate_cuids_from_bp_auid(bp2)

    def test_order_insensitive(self):
        # reference tests_auids.py:51-59
        assert (auids.generate_bp_auid_from_cuids(["N22", "N21"])
                == auids.generate_bp_auid_from_cuids(["N21", "N22"]))

    def test_b64_pipeline(self):
        # reference tests_auids.py:61-75
        for cuids in (
            ["N1"],
            ["N(1,0)1", "N(1,0)2", "N(1,1)1"],
            ["[1,(1,1)]1", "[1,(2,2)]2", "[1,(2,3)]2", "[1,(3,2)]2", "[1,(3,3)]2"],
        ):
            comp_b64, hash_b64 = auids.generate_auid_hash_b64(cuids)
            assert auids.cuids_from_auid_b64(comp_b64) == sorted(set(cuids))
            assert len(auids.decode64(hash_b64)) == 20  # blake2b-20


class TestOptimizer:
    # golden pairs verbatim from reference tests_auids.py:136-163
    def test_golden_pairs(self):
        assert auids.optimize_cuids(
            ["N11", "N11", "N12", "N21", "N22", "N23", "N24"], 2) == ["N11", "N12", "N2"]
        assert auids.optimize_cuids(
            ["N11", "N11", "N12", "N21", "N22", "N23", "N24", "N311", "N312", "N313",
             "N314", "N321", "N322", "N323", "N324", "N331", "N332", "N333", "N334",
             "N341", "N342", "N343", "N344"], 2) == ["N11", "N12", "N2", "N3"]
        assert auids.optimize_cuids(
            ["N11", "N11", "N12", "N21", "N22", "N23", "N24", "N311", "N312", "N313",
             "N314", "N321", "N322", "N323", "N324", "N331", "N332", "N333", "N334",
             "N341", "N342", "N343"], 2) == ["N11", "N12", "N2", "N31", "N32", "N33",
                                             "N341", "N342", "N343"]
        assert auids.optimize_cuids(["N", "S", "O", "Q"], 2) == ["N", "O", "Q", "S"]
        assert auids.optimize_cuids(["N1", "N2", "N3", "N4", "S", "O", "Q"], 2) == \
            ["N", "O", "Q", "S"]
        assert auids.optimize_cuids(
            ["R11", "R12", "R13", "R141", "R142", "R143", "R144"], 2) == ["R1"]
        assert auids.optimize_cuids(
            ["R11", "R12", "R13", "R141", "R142", "R143"], 2) == \
            ["R11", "R12", "R13", "R141", "R142", "R143"]
        assert auids.optimize_cuids(
            ["R11", "R12", "R13", "R14", "R15", "R16", "R17", "R18", "R19"], 3) == ["R1"]

    def test_is_optimal(self):
        # reference tests_auids.py:165-179
        assert not auids.is_optimal_cuids(["N11", "N11", "N12", "N21", "N22", "N23", "N24"], 2)
        assert auids.is_optimal_cuids(["N11", "N12", "N2"], 2)
        assert auids.is_optimal_cuids(["N11", "N12", "N2", "N3"], 2)
        assert auids.is_optimal_cuids(
            ["N11", "N12", "N2", "N31", "N32", "N33", "N341", "N342", "N343"], 2)
        assert not auids.is_optimal_cuids(
            ["R11", "R12", "R13", "R14", "R15", "R16", "R17", "R18", "R19"], 3)
        assert auids.is_optimal_cuids(("R1",), 3)

    def test_rhealpix_generator_equivalence(self):
        # reference tests_auids.py:77-91: optimized-then-encoded == decode
        for cuids in (
            ["N1"],
            ["N1", "N21", "N22", "N23", "N24", "S12", "S13"],
            ["N11", "N11", "N12", "N21", "N22", "N23", "N24", "N311", "N312", "N313",
             "N314", "N321", "N322", "N323", "N324", "N331", "N332", "N333", "N334",
             "N341", "N342", "N343"],
        ):
            opt = auids.optimize_cuids(cuids, 2)
            comp_b64, _ = auids.generate_auid_hash_b64(opt)
            assert auids.cuids_from_auid_b64(comp_b64) == opt


class TestSubarea:
    # reference tests_auids.py:93-134
    def _auid(self, cuids):
        comp_b64, _ = auids.generate_auid_hash_b64(cuids)
        return comp_b64

    def test_positive(self):
        a1 = self._auid(["N1", "N21", "N22", "N23", "N25", "S12", "S13"])
        a2 = self._auid(["N1", "N21", "N22", "N23", "N25", "S12", "S13", "S14"])
        assert auids.is_a_subarea(a1, a2)

        a1 = self._auid(["N1", "N21", "N22", "N23", "N25", "S12", "S13", "S14"])
        a2 = self._auid(["N1", "N21", "N22", "N23", "N25", "O143", "O5135321", "S12",
                         "S13", "S14", "S145", "S2123", "S2124"])
        assert auids.is_a_subarea(a1, a2)

        a1 = self._auid(["N1", "N21", "N22", "N23", "N25", "S12", "S13", "S14", "O143"])
        assert auids.is_a_subarea(a1, a2)

        a1 = self._auid(["N1", "N21", "N22", "N23", "N25", "S12", "S13", "O143"])
        assert auids.is_a_subarea(a1, a2)

    def test_negative(self):
        a1 = self._auid(["N1", "N21", "N22", "N23", "N25", "S12", "S13", "S15"])
        a2 = self._auid(["N1", "N21", "N22", "N23", "N25", "S12", "S13", "S14"])
        assert not auids.is_a_subarea(a1, a2)

        a1 = self._auid(["N1", "N21", "N22", "N23", "N25", "S13", "S14"])
        a2 = self._auid(["N1", "N21", "N22", "N23", "N25", "O143", "O5135321", "S12",
                         "S13", "S14", "S145", "S2123", "S2124"])
        assert not auids.is_a_subarea(a1, a2)

        a1 = self._auid(["N1", "N21", "N22", "N23", "N25", "S12", "S13", "O1434"])
        assert not auids.is_a_subarea(a1, a2)


def test_subarea_not_fooled_across_faces():
    """Cross-face false positive (fixed reference bug, rhpx.py:33-49): the
    digits of face N must not match identical digits under face O."""
    a_n0, _ = auids.generate_auid_hash_b64(["N0"])
    a_o0, _ = auids.generate_auid_hash_b64(["O0"])
    assert not auids.is_a_subarea(a_n0, a_o0)
    assert not auids.is_a_subarea(a_o0, a_n0)
    # genuine containment (same cells present) still holds
    small, _ = auids.generate_auid_hash_b64(["N0", "N1"])
    big, _ = auids.generate_auid_hash_b64(["N0", "N1", "O2"])
    assert auids.is_a_subarea(small, big)
    assert not auids.is_a_subarea(big, small)


def test_empty_cuid_set_roundtrip():
    comp, h = auids.generate_auid_hash_b64([])
    assert auids.cuids_from_auid_b64(comp) == []


def test_collapse_sql_and_bp_formula_match_kernel():
    """The DuckDB oracle constructions in queries5 (unrolled collapse chain,
    LCP-based BP serialization) agree with the stdlib kernel on randomized
    sets, including mixed-length seeds and complete sibling cascades."""
    import random

    import duckdb

    from dggstools_spark.dggs import auids as core
    from dggstools_spark.queries5 import _bp_agg_sql, _collapse_sql

    random.seed(13)
    for trial in range(8):
        max_len = random.choice([3, 4, 5])
        cu = {random.choice("NOPQRS")
              + "".join(random.choice("012345678") for _ in range(max_len - 1))
              for _ in range(random.randint(5, 60))}
        for _ in range(random.randint(1, 4)):  # force collapsible sets
            p = random.choice(list(cu))[:max_len - 1]
            cu |= {p + d for d in "012345678"}
        if trial % 2 == 0:  # mixed lengths, like the auid_optimize seeds
            p = random.choice(list(cu))[:max_len - 2] or "N"
            cu |= {p + d for d in "012345678"}
        cu = sorted(cu)
        expect = core.optimize_cuids(cu, 3)

        con = duckdb.connect()
        con.execute("CREATE TABLE s_in(cellid VARCHAR)")
        con.executemany("INSERT INTO s_in VALUES (?)", [(c,) for c in cu])
        ml = max(len(c) for c in cu)
        got = [r[0] for r in con.execute(
            f"WITH s{ml} AS MATERIALIZED (SELECT DISTINCT cellid FROM s_in),"
            f"{_collapse_sql([], ml, 9)} SELECT cellid FROM s1 ORDER BY cellid"
        ).fetchall()]
        assert got == expect, f"collapse mismatch (trial {trial})"

        con.execute("CREATE TABLE s1x(g VARCHAR, cellid VARCHAR)")
        con.executemany("INSERT INTO s1x VALUES ('g', ?)", [(c,) for c in expect])
        row = con.execute(
            f"WITH s1 AS (SELECT g AS source, cellid FROM s1x),"
            f"{_bp_agg_sql('source', ml - 1)}").fetchone()
        assert row[2] == core.generate_bp_auid_from_cuids(expect), \
            f"bp mismatch (trial {trial})"


def test_grouped_collapse_sql_matches_kernel():
    """The keys=['source'] collapse chain (q_auid_groups oracle) matches
    per-group kernel optimization — including groups where complete sibling
    sets actually collapse and cascade (the driver fixture rarely collapses
    at res 3, so this pins the grouped SQL path explicitly)."""
    import random

    import duckdb

    from dggstools_spark.dggs import auids as core
    from dggstools_spark.queries5 import _bp_agg_sql, _collapse_sql

    random.seed(29)
    groups = {}
    for g in ("g1", "g2", "g3"):
        cu = {random.choice("NOPQRS")
              + "".join(random.choice("012345678") for _ in range(3))
              for _ in range(random.randint(4, 40))}
        for _ in range(random.randint(1, 3)):  # force cascades per group
            p = random.choice(list(cu))[:3]
            cu |= {p + d for d in "012345678"}
        p2 = random.choice(list(cu))[:2]       # sometimes a full 81-cell block
        if g == "g2":
            cu |= {p2 + a + b for a in "012345678" for b in "012345678"}
        groups[g] = sorted(cu)

    con = duckdb.connect()
    con.execute("CREATE TABLE s_in(source VARCHAR, cellid VARCHAR)")
    con.executemany("INSERT INTO s_in VALUES (?, ?)",
                    [(g, c) for g, cs in groups.items() for c in cs])
    sql = (f"WITH s4 AS MATERIALIZED (SELECT DISTINCT source, cellid FROM s_in),"
           f"{_collapse_sql(['source'], 4, 9)},{_bp_agg_sql('source', 3)}")
    got = {r[0]: (r[1], r[2]) for r in con.execute(sql).fetchall()}
    for g, cu in groups.items():
        opt = core.optimize_cuids(cu, 3)
        assert got[g][0] == len(opt), f"count mismatch in {g}"
        assert got[g][1] == core.generate_bp_auid_from_cuids(opt), \
            f"bp mismatch in {g}"
