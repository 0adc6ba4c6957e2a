

def test_event_funnel_semantics(spark):
    """Hand-built funnel: ordering matters, equal timestamps don't count,
    skipped stages break the chain."""
    import datetime as dt
    import duckdb
    from geoclimate_spark.operators import windows as W

    t0 = dt.datetime(2024, 1, 1)
    s = lambda sec: t0 + dt.timedelta(seconds=sec)
    rows = [
        # user 1: full ordered funnel
        (1, s(0), 1, "view", 0.0, "{}"), (2, s(10), 1, "click", 0.0, "{}"),
        (3, s(20), 1, "signup", 0.0, "{}"), (4, s(30), 1, "purchase", 0.0, "{}"),
        # user 2: purchase fires BEFORE the signup reach → reaches
        # view/click/signup but NOT purchase (first occurrence too early)
        (5, s(0), 2, "view", 0.0, "{}"), (6, s(5), 2, "purchase", 0.0, "{}"),
        (7, s(10), 2, "click", 0.0, "{}"), (8, s(20), 2, "signup", 0.0, "{}"),
        # user 3: click simultaneous with view → strict > fails at click
        (9, s(0), 3, "view", 0.0, "{}"), (10, s(0), 3, "click", 0.0, "{}"),
        # user 4: never views → reaches nothing
        (11, s(0), 4, "click", 0.0, "{}"), (12, s(1), 4, "purchase", 0.0, "{}"),
    ]
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long,"
              " event_type string, value double, props string")
    got = {r.stage: r.n_users for r in W.event_funnel(df).collect()}
    assert got == {"view": 3, "click": 2, "signup": 2, "purchase": 1}

    con = duckdb.connect()
    con.execute("create table ev (event_id bigint, ts timestamp,"
                " user_id bigint, event_type varchar, value double,"
                " props varchar)")
    con.executemany("insert into ev values (?, ?, ?, ?, ?, ?)", rows)
    want = {w.stage: w.n_users
            for w in con.execute(W.event_funnel_sql("ev")).fetchdf().itertuples()}
    assert got == want
