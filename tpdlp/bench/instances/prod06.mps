* Multi-period production planning, 6 periods.
* BAL rows: I[t-1] + P[t] - I[t] - B[t-1] + B[t] = D[t].
* CAP rows are ranged: a minimum-utilisation window.
NAME          PROD06
ROWS
 N  COST
 E  BAL1
 L  CAP1
 E  BAL2
 L  CAP2
 E  BAL3
 L  CAP3
 E  BAL4
 L  CAP4
 E  BAL5
 L  CAP5
 E  BAL6
 L  CAP6
COLUMNS
    P1        COST      7              BAL1      1
    P1        CAP1      1
    I1        COST      0.4            BAL1      -1
    I1        BAL2      1              CAP1      0.5
    B1        COST      2.5            BAL1      1
    B1        BAL2      -1
    P2        COST      7.4            BAL2      1
    P2        CAP2      1
    I2        COST      0.4            BAL2      -1
    I2        BAL3      1              CAP2      0.5
    B2        COST      2.5            BAL2      1
    B2        BAL3      -1
    P3        COST      7.2            BAL3      1
    P3        CAP3      1
    I3        COST      0.4            BAL3      -1
    I3        BAL4      1              CAP3      0.5
    B3        COST      2.5            BAL3      1
    B3        BAL4      -1
    P4        COST      7.8            BAL4      1
    P4        CAP4      1
    I4        COST      0.4            BAL4      -1
    I4        BAL5      1              CAP4      0.5
    B4        COST      2.5            BAL4      1
    B4        BAL5      -1
    P5        COST      7.5            BAL5      1
    P5        CAP5      1
    I5        COST      0.4            BAL5      -1
    I5        BAL6      1              CAP5      0.5
    B5        COST      2.5            BAL5      1
    B5        BAL6      -1
    P6        COST      7.6            BAL6      1
    P6        CAP6      1
    I6        COST      0.4            BAL6      -1
    I6        CAP6      0.5
    B6        COST      2.5            BAL6      1
RHS
    RHS       BAL1      80             CAP1      150
    RHS       BAL2      140            CAP2      150
    RHS       BAL3      95             CAP3      140
    RHS       BAL4      160            CAP4      150
    RHS       BAL5      130            CAP5      150
    RHS       BAL6      120            CAP6      140
    RHS       COST      -850
RANGES
    RNG       CAP1      60             
    RNG       CAP2      60             
    RNG       CAP3      60             
    RNG       CAP4      60             
    RNG       CAP5      60             
    RNG       CAP6      60             
BOUNDS
 UP BND       I1        60             
 UP BND       B1        40             
 UP BND       I2        60             
 UP BND       B2        40             
 UP BND       I3        60             
 UP BND       B3        40             
 UP BND       I4        60             
 UP BND       B4        40             
 UP BND       I5        60             
 UP BND       B5        40             
 UP BND       I6        60             
 UP BND       B6        40             
 FX BND       I6        15             
 FX BND       B6        0              
 LO BND       P1        20             
ENDATA
