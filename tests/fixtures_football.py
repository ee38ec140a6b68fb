"""Synthetic raw payloads in both API shapes (FIXTURES.md §1-5).

One league of 3 teams, internally consistent per FIXTURES.md §8:
games_played = W+D+L, points = 3W+D, GD = GF-GA, rank ordered by
(points desc, GD desc). Numeric stats are STRINGS in the API-Football
shape (real API behavior) and INTEGERS in the API-Sports shape.
"""

from __future__ import annotations

import json
import os

SEASON = 2023
LEAGUE = 153

# (team, rank, W, D, L, GF, GA) — points/GP derived
_TEAMS = [
    ("Alpha FC", 1, 10, 3, 1, 30, 10),
    ("Beta United", 2, 8, 4, 2, 25, 15),
    ("Gamma City", 3, 5, 2, 7, 18, 22),
]


def apifootball_teams() -> list[dict]:
    return [
        {
            "team_key": str(100 + i),
            "team_name": name,
            "team_country": "Testland",
            "venue": {"venue_name": f"{name} Park", "venue_city": f"City{i}"},
        }
        for i, (name, *_rest) in enumerate(_TEAMS)
    ]


def apifootball_standings() -> list[dict]:
    out = []
    for i, (name, rank, w, d, l, gf, ga) in enumerate(_TEAMS):
        out.append(
            {
                "team_id": str(100 + i),
                "team_name": name,
                "league_id": str(LEAGUE),
                "league_name": "Test League",
                "overall_league_position": str(rank),
                "overall_league_PTS": str(3 * w + d),
                "overall_league_payed": str(w + d + l),  # sic: upstream typo
                "overall_league_W": str(w),
                "overall_league_D": str(d),
                "overall_league_L": str(l),
                "overall_league_GF": str(gf),
                "overall_league_GA": str(ga),
                "overall_league_form": "WWLDW",
            }
        )
    return out


def apisports_teams() -> dict:
    return {
        "response": [
            {
                "team": {"id": 100 + i, "name": name, "country": "Testland"},
                "venue": {"name": f"{name} Park", "city": f"City{i}"},
            }
            for i, (name, *_rest) in enumerate(_TEAMS)
        ]
    }


def apisports_standings() -> dict:
    rows = []
    for i, (name, rank, w, d, l, gf, ga) in enumerate(_TEAMS):
        rows.append(
            {
                "rank": rank,
                "team": {"id": 100 + i, "name": name},
                "points": 3 * w + d,
                "goalsDiff": gf - ga,
                "form": "WWLDW",
                "all": {
                    "played": w + d + l,
                    "win": w,
                    "draw": d,
                    "lose": l,
                    "goals": {"for": gf, "against": ga},
                },
            }
        )
    return {
        "response": [
            {
                "league": {
                    "id": LEAGUE,
                    "name": "Test League",
                    "season": SEASON,
                    "standings": [rows],
                }
            }
        ]
    }


def stage(tmpdir: str, api: str, endpoint: str, payload, season=SEASON, league=LEAGUE,
          filename: str = "run1_2024-01-01.json") -> str:
    path = os.path.join(
        tmpdir, api, f"season_{season}", f"league_{league}", endpoint, filename
    )
    os.makedirs(os.path.dirname(path), exist_ok=True)
    with open(path, "w") as f:
        if isinstance(payload, str):
            f.write(payload)  # raw (for malformed-JSON fixtures)
        else:
            json.dump(payload, f)
    return path
