* Unbounded: (1,1) is a feasible improving ray.
NAME          UNBND01
ROWS
 N  COST
 L  DIFF
 G  FLOOR
COLUMNS
    X1        COST      -1             DIFF      1
    X1        FLOOR     1
    X2        COST      -1             DIFF      -1
    X2        FLOOR     1
RHS
    RHS       DIFF      3              FLOOR     2
ENDATA
