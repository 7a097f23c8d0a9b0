"""Round-10 probe sweep (r9 verdict #7): the GRANT-family statement
tail — role/user lifecycle no-ops, SHOW ROLES/USERS/FUTURE GRANTS
shaped listings, and account-level security objects refusing by
name. Prints SWEEP PASS when no case dies generically."""
from dbt_icebreaker_spark.session import get_spark
from dbt_icebreaker_spark.runner import IcebreakerEngine
import tempfile
spark = get_spark(app_name="probe", warehouse_dir=tempfile.mkdtemp())
eng = IcebreakerEngine(spark)
cases = ["CREATE ROLE analyst", "CREATE ROLE IF NOT EXISTS analyst",
         "CREATE OR REPLACE ROLE analyst",
         "DROP ROLE analyst", "ALTER ROLE analyst SET COMMENT = 'x'",
         "CREATE USER bob", "DROP USER bob", "ALTER USER bob SET DEFAULT_ROLE = 'r'",
         "SHOW ROLES", "SHOW USERS",
         "GRANT ROLE analyst TO USER bob",
         "REVOKE SELECT ON TABLE t FROM ROLE analyst",
         "SHOW GRANTS TO ROLE analyst",
         "SHOW FUTURE GRANTS IN SCHEMA s"]
cases += ["SHOW WAREHOUSES", "SHOW TRANSACTIONS", "SHOW LOCKS",
          "SHOW VARIABLES", "DESCRIBE WAREHOUSE w",
          # r11: sequences graduated to a real session registry
          "SHOW SEQUENCES"]
refusals = ["CREATE NETWORK POLICY np ALLOWED_IP_LIST = ('1.2.3.4')",
            "CREATE SECURITY INTEGRATION si TYPE = SAML2",
            "CREATE STORAGE INTEGRATION sti TYPE = EXTERNAL_STAGE",
            "CREATE API INTEGRATION ai API_PROVIDER = aws_api_gateway",
            "CREATE NOTIFICATION INTEGRATION ni TYPE = QUEUE",
            "ALTER ACCOUNT SET TIMEZONE = 'UTC'",
            "SHOW STREAMS", "SHOW TASKS", "SHOW PIPES", "SHOW STAGES",
            "SHOW ALERTS", "DESCRIBE STAGE s1",
            "ALTER TASK tk RESUME", "CREATE EXTERNAL TABLE e (c INT)",
            "CREATE EVENT TABLE ev", "CREATE ALERT al WAREHOUSE = w",
            "CREATE PASSWORD POLICY pp PASSWORD_MIN_LENGTH = 12",
            "CREATE SESSION POLICY sp SESSION_IDLE_TIMEOUT_MINS = 30"]
ok = True
for q in cases:
    try:
        r = eng.execute(q)
        rows = r.collect() if r is not None else None
        print("OK  ", q, "->", str(rows)[:70])
    except Exception as e:
        ok = False
        print("ERR ", q, "->", str(e)[:100].replace("\n", " "))
for q in refusals:
    try:
        eng.execute(q)
        ok = False
        print("NOREFUSE", q)
    except Exception as e:
        s = str(e)
        actionable = ("Spark has no" in s or "no Spark" in s
                      or "nothing to describe" in s)
        print("REF" if actionable else "GENERIC!", q, "->", s[:90].replace("\n", " "))
        if not actionable: ok = False
print("SWEEP", "PASS" if ok else "FAIL")
spark.stop()
