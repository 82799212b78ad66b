"""S10 BOL REST acquisition: login/fetch/logout lifecycle, raw-json
bronze archive, and searchResults parsing — driven by a fake
transport (no network in this container)."""

from __future__ import annotations

from etl_script_spark.sources import rest

CFG = rest.BolApiConfig(
    login_url="https://api.example/login",
    getdata_url="https://api.example/getdata",
    logout_url="https://api.example/logout",
    username="u",
    password="p",
    data_field="ALL",
)


class FakeTransport:
    def __init__(self, fail_logout: bool = False):
        self.calls: list[tuple[str, dict, dict]] = []
        self.fail_logout = fail_logout

    def __call__(self, url, form, headers):
        self.calls.append((url, form, headers))
        if url.endswith("/login"):
            assert form["grant_type"] == "password"
            return {"access_token": "TOK123", "token_type": "Bearer"}
        if url.endswith("/getdata"):
            assert headers["Authorization"] == "Bearer TOK123"
            reg = form["registrationId"]
            if reg == "empty":
                return {"searchResults": None}
            return {
                "searchResults": [
                    {"registrationNo": reg, "fiscalYear": "2566"},
                    {"registrationNo": reg, "fiscalYear": "2567"},
                ]
            }
        if url.endswith("/logout"):
            if self.fail_logout:
                raise RuntimeError("boom")
            return {"ok": True}
        raise AssertionError(f"unexpected url {url}")


def test_client_lifecycle_and_token_reuse():
    tr = FakeTransport()
    client = rest.BolApiClient(CFG, tr)
    raw, results = client.fetch("0105540085581")
    assert len(results) == 2 and results[0]["fiscalYear"] == "2566"
    assert "searchResults" in raw
    client.fetch("0105540085582")  # second fetch: no second login
    logins = [c for c in tr.calls if c[0].endswith("/login")]
    assert len(logins) == 1
    _, empty = client.fetch("empty")
    assert empty == []


def test_logout_never_raises():
    tr = FakeTransport(fail_logout=True)
    client = rest.BolApiClient(CFG, tr)
    client.login()
    client.logout()  # swallowed


def test_fetch_raw_archive_and_parse(spark):
    tr = FakeTransport()
    df = rest.fetch_raw_archive(spark, ["100", "empty"], CFG, tr)
    rows = {r["registration_no"]: r for r in df.collect()}
    assert rows["100"]["n_results"] == 2
    assert rows["empty"]["n_results"] == 0
    # logout happened exactly once at the end
    assert sum(1 for c in tr.calls if c[0].endswith("/logout")) == 1
    parsed = rest.parse_search_results(df)
    got = [
        (r["registration_no"], r["result"]["fiscalYear"] if r["result"] else None)
        for r in parsed.collect()
    ]
    assert sorted(got) == [("100", "2566"), ("100", "2567"), ("empty", None)]
