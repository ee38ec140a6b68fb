"""Per-API normalize + join transforms (reference T5-T10).

Semantics replicated from /root/reference/dataflow-flex/
football_pipeline/transforms.py — but expressed as DataFrame plans:
the reference's per-group Python dict build+probe (transforms.py:32,89)
becomes a broadcast hash inner join; its "log & skip" probe misses
(transforms.py:44-46,98-100) become an explicit anti-join output; its
raise-on-bad-group guards become group-level error rows that the
pipeline routes to the dead-letter sink.

Both transforms return (records_df, dropped_df, group_errors_df):
- records_df: unified columns (pre-enforcement) + group_pk + _err
  (record-level transform errors, e.g. unparseable GF/GA)
- dropped_df: standings rows with no matching team (reference skips
  these with a warning — NOT dead-letter)
- group_errors_df: (group_pk, error) guard failures that fail the
  whole season-league group (transforms.py:26-27,77-87)

Known divergences (documented, pinned by golden tests):
- JSON null vs absent key are indistinguishable after a schema'd read;
  the reference's ``int(None)`` TypeError on an explicit-null GF
  becomes "default to 0" here (reference defaulted only absent keys).
- Duplicate team build keys: the reference's dict keeps the LAST team
  per key; we drop duplicates (fixtures contain no dups).
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


@dataclass
class NormalizeResult:
    records: DataFrame
    dropped: DataFrame
    group_errors: DataFrame


def _int_guard(col: F.Column, field: str) -> F.Column:
    """Pre-enforcement int() parity (transforms.py:41-42): missing → 0,
    present-but-unparseable → group-failing error."""
    return F.when(
        col.isNotNull() & col.try_cast("long").isNull(),
        F.lit(f"invalid literal for int() in field '{field}'"),
    )


def normalize_apifootball(teams: DataFrame, standings: DataFrame) -> NormalizeResult:
    """API-Football: standings drives, teams is the broadcast build side
    keyed on team_key (transforms.py:32-69). team_name comes from the
    STANDINGS side, venue/country from the teams side."""
    t = teams.select(
        F.col("team_key"),
        F.col("team_country").alias("_t_country"),
        F.col("venue.venue_name").alias("_t_venue_name"),
        F.col("venue.venue_city").alias("_t_venue_city"),
        F.col("group_pk").alias("_t_group_pk"),
    ).dropDuplicates(["_t_group_pk", "team_key"])

    s = standings.alias("s")
    join_cond = (F.col("s.team_id") == F.col("team_key")) & (
        F.col("s.group_pk") == F.col("_t_group_pk")
    )

    joined = s.join(F.broadcast(t), join_cond, "inner")
    dropped = s.join(F.broadcast(t), join_cond, "left_anti").select(
        "group_pk", "team_id", "team_name"
    )

    gf = F.coalesce(F.col("overall_league_GF").try_cast("long"), F.lit(0))
    ga = F.coalesce(F.col("overall_league_GA").try_cast("long"), F.lit(0))
    err = F.coalesce(
        _int_guard(F.col("overall_league_GF"), "overall_league_GF"),
        _int_guard(F.col("overall_league_GA"), "overall_league_GA"),
    )

    records = joined.select(
        F.col("group_pk"),
        err.alias("_err"),
        F.concat_ws("-", "group_pk", "team_id").alias("pk"),
        F.col("team_id"),
        F.col("s.team_name").alias("team_name"),
        F.col("_t_country").alias("team_country"),
        F.col("league_id"),
        F.col("league_name"),
        # season = pk.split('-')[0] (transforms.py:55) — stays a string
        # here; the INTEGER enforcement cast normalizes (or rejects
        # "unknown" groups, failing the group exactly like int() would).
        F.split_part(F.col("group_pk"), F.lit("-"), F.lit(1)).alias("season"),
        F.col("overall_league_position").alias("rank"),
        F.col("overall_league_PTS").alias("points"),
        # sic: upstream typo "payed" is load-bearing (transforms.py:58)
        F.col("overall_league_payed").alias("games_played"),
        F.col("overall_league_W").alias("wins"),
        F.col("overall_league_D").alias("draws"),
        F.col("overall_league_L").alias("losses"),
        gf.alias("goals_for"),
        ga.alias("goals_against"),
        # T8 DERIVES the difference (transforms.py:64)...
        (gf - ga).alias("goal_difference"),
        F.col("overall_league_form").alias("form"),
        F.col("_t_venue_name").alias("venue_name"),
        F.col("_t_venue_city").alias("venue_city"),
        F.lit(None).cast("string").alias("update_timestamp"),
    )

    # Guard (transforms.py:26-27): a group whose teams OR standings side
    # is empty fails whole. Evaluated over per-group presence.
    t_groups = teams.select(F.col("group_pk")).distinct()
    s_groups = standings.select(F.col("group_pk")).distinct()
    missing = s_groups.join(t_groups, "group_pk", "left_anti").unionByName(
        t_groups.join(s_groups, "group_pk", "left_anti")
    )
    group_errors = missing.select(
        "group_pk",
        F.lit(
            "APIFootball input data is missing for standings or teams."
        ).alias("error"),
    )
    return NormalizeResult(records, dropped, group_errors)


def normalize_apisports(teams: DataFrame, standings: DataFrame) -> NormalizeResult:
    """API-Sports: nested unwrap response[0].league.standings[0][]
    (transforms.py:75-100). team_name comes from the TEAMS side;
    goal_difference is COPIED from goalsDiff, not derived
    (transforms.py:118) — asymmetric with API-Football on purpose."""
    # Teams: one row per response element; build key is team.id.
    t = (
        teams.select(
            F.col("group_pk").alias("_t_group_pk"),
            F.explode("response").alias("r"),
        )
        .select(
            "_t_group_pk",
            F.col("r.team.id").alias("_t_team_id"),
            F.col("r.team.name").alias("_t_team_name"),
            F.col("r.team.country").alias("_t_country"),
            F.col("r.venue.name").alias("_t_venue_name"),
            F.col("r.venue.city").alias("_t_venue_city"),
        )
        .filter(F.col("_t_team_id").isNotNull())
        .dropDuplicates(["_t_group_pk", "_t_team_id"])
    )

    # Standings: league struct from response[0]; rows from standings[0].
    league = F.element_at("response", 1).getField("league")
    st_all = standings.select(
        "group_pk",
        (F.col("response").isNull() | (F.size("response") == 0)).alias("_empty"),
        league.getField("id").alias("_league_id"),
        league.getField("name").alias("_league_name"),
        league.getField("season").alias("_season"),
        F.element_at(league.getField("standings"), 1).alias("_rows"),
    )
    # Empty `response` on the standings side fires the emptiness guard
    # (transforms.py:77-82), not the structure guard — reference order.
    empty_standings = st_all.filter(F.col("_empty")).select(
        "group_pk",
        F.lit(
            "API-Sports 'response' data is empty or missing for standings or teams."
        ).alias("error"),
    )
    st = st_all.filter(~F.col("_empty")).drop("_empty")

    # Guard 2 (transforms.py:84-87): missing league/standings structure.
    bad_structure = st.filter(F.col("_rows").isNull()).select(
        "group_pk",
        F.concat(
            F.lit(
                "Could not find standings list in API-Sports data structure for PK "
            ),
            F.col("group_pk"),
        ).alias("error"),
    )

    s = st.filter(F.col("_rows").isNotNull()).select(
        "group_pk",
        "_league_id",
        "_league_name",
        "_season",
        F.explode("_rows").alias("row"),
    )

    join_cond = (F.col("row.team.id") == F.col("_t_team_id")) & (
        F.col("group_pk") == F.col("_t_group_pk")
    )
    joined = s.join(F.broadcast(t), join_cond, "inner")
    dropped = s.join(F.broadcast(t), join_cond, "left_anti").select(
        "group_pk",
        F.col("row.team.id").cast("string").alias("team_id"),
        F.col("row.team.name").alias("team_name"),
    )

    records = joined.select(
        F.col("group_pk"),
        F.lit(None).cast("string").alias("_err"),
        F.concat_ws("-", "group_pk", F.col("row.team.id")).alias("pk"),
        F.col("row.team.id").alias("team_id"),
        F.col("_t_team_name").alias("team_name"),
        F.col("_t_country").alias("team_country"),
        F.col("_league_id").alias("league_id"),
        F.col("_league_name").alias("league_name"),
        F.col("_season").alias("season"),
        F.col("row.rank").alias("rank"),
        F.col("row.points").alias("points"),
        F.col("row.all.played").alias("games_played"),
        F.col("row.all.win").alias("wins"),
        F.col("row.all.draw").alias("draws"),
        F.col("row.all.lose").alias("losses"),
        F.col("row.all.goals.for").alias("goals_for"),
        F.col("row.all.goals.against").alias("goals_against"),
        # ...T9 COPIES it (transforms.py:118)
        F.col("row.goalsDiff").alias("goal_difference"),
        F.col("row.form").alias("form"),
        F.col("_t_venue_name").alias("venue_name"),
        F.col("_t_venue_city").alias("venue_city"),
        F.lit(None).cast("string").alias("update_timestamp"),
    )

    # Guard 1 (transforms.py:77-82): empty response on either side.
    t_groups = t.select(F.col("_t_group_pk").alias("group_pk")).distinct()
    s_groups = st.select("group_pk").distinct()
    missing = s_groups.join(t_groups, "group_pk", "left_anti").unionByName(
        t_groups.join(s_groups, "group_pk", "left_anti")
    )
    empty_guard = missing.select(
        "group_pk",
        F.lit(
            "API-Sports 'response' data is empty or missing for standings or teams."
        ).alias("error"),
    )
    group_errors = empty_guard.unionByName(empty_standings).unionByName(bad_structure)
    return NormalizeResult(records, dropped, group_errors)


TRANSFORM_MAP = {
    "apifootball": normalize_apifootball,
    "apisports": normalize_apisports,
}
