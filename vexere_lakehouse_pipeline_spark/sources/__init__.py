"""Sources: bronze-contract fixture generators and ingestion helpers.

The reference's Selenium crawlers (S12, SURVEY.md §2.1) are out of
engine scope; any producer that emits the bronze contracts plugs in
here.  Tests use the deterministic generators in ``fixtures``.
"""
