"""The MotoGP integration pipeline — Spark rendition of ``motogp.ktr``.

Modules (one per output table of SURVEY.md §1.4):

- ``inputs``        schema-declared readers for the 11 sources
- ``circuits``      Circuit dim (``motogp.ktr:1653``)
- ``teams``         Teams dim (``motogp.ktr:8525``)
- ``races_weather`` Race + Info-Race/weather (``motogp.ktr:4649``, ``:3595``)
- ``riders``        enriched Rider master (``motogp.ktr:4888`` branch)
- ``results``       results fact assembly + synthetic stand-in for the
                    missing ``race_results_view.csv`` blob
- ``participation`` Participation fact (``motogp.ktr:4149``)
- ``standings``     Team Standings (``motogp.ktr:8426``)
- ``runner``        build-all orchestration + parquet sinks
"""
