CREATE TABLE work_nation AS SELECT * FROM nation;
BEGIN;
UPDATE work_nation SET n_name = 'RENAMED' WHERE n_nationkey = 3;
INSERT INTO work_nation VALUES (900, 'NEW_NATION', 1);
COMMIT;
SELECT COUNT(*) AS n, COUNT(CASE WHEN n_name = 'RENAMED' THEN 1 END) AS renamed FROM work_nation
