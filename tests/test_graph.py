

def test_khop_min_hops_chain_and_cycle(spark):
    from emdatapipelines_spark.operators.graph import khop_min_hops

    # chain a->b->c->d plus a shortcut a->c: min_hops picks the shortcut.
    e = spark.createDataFrame(
        [("a", "b"), ("b", "c"), ("c", "d"), ("a", "c")], "src string, dst string"
    )
    out = {(r["src"], r["dst"]): r["min_hops"] for r in khop_min_hops(e, k=3).collect()}
    assert out[("a", "c")] == 1  # shortcut beats the 2-hop path
    assert out[("a", "d")] == 2  # via the shortcut
    assert out[("b", "d")] == 2
    assert ("d", "a") not in out  # directed


def test_khop_cycle_terminates_and_self_reaches(spark):
    from emdatapipelines_spark.operators.graph import khop_min_hops

    # 3-cycle: every node reaches itself in exactly 3 hops; k=3 bounded.
    e = spark.createDataFrame(
        [("x", "y"), ("y", "z"), ("z", "x")], "src string, dst string"
    )
    out = {(r["src"], r["dst"]): r["min_hops"] for r in khop_min_hops(e, k=3).collect()}
    assert out[("x", "x")] == 3 and out[("x", "y")] == 1 and out[("x", "z")] == 2
    assert len(out) == 9
