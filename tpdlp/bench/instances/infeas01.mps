* Infeasible by construction: demand 700 > supply 500.
NAME          INFEAS01
ROWS
 N  COST
 L  SUP1
 L  SUP2
 G  DEM1
 G  DEM2
 G  DEM3
COLUMNS
    T11       COST      2              SUP1      1
    T11       DEM1      1
    T12       COST      3              SUP1      1
    T12       DEM2      1
    T13       COST      4              SUP1      1
    T13       DEM3      1
    T21       COST      3              SUP2      1
    T21       DEM1      1
    T22       COST      4              SUP2      1
    T22       DEM2      1
    T23       COST      5              SUP2      1
    T23       DEM3      1
RHS
    RHS       SUP1      200            SUP2      300
    RHS       DEM1      250            DEM2      250
    RHS       DEM3      200
ENDATA
