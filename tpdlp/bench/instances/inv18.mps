* Production/inventory LP, 18 periods, backorders allowed.
* BAL rows chain free inventories; SEC rows nest inside HORIZON.
NAME          INV18
ROWS
 N  COST
 E  BAL1
 E  BAL2
 E  BAL3
 E  BAL4
 E  BAL5
 E  BAL6
 E  BAL7
 E  BAL8
 E  BAL9
 E  BAL10
 E  BAL11
 E  BAL12
 E  BAL13
 E  BAL14
 E  BAL15
 E  BAL16
 E  BAL17
 E  BAL18
 E  SEC1
 E  SEC2
 E  SEC3
 E  HORIZON
COLUMNS
    P1        COST      2.06           BAL1      1
    P1        SEC1      1              HORIZON   1
    I1        COST      0.25           BAL1      -1
    I1        BAL2      1
    P2        COST      4.53           BAL2      1
    P2        SEC1      1              HORIZON   1
    I2        COST      0.25           BAL2      -1
    I2        BAL3      1
    P3        COST      4.69           BAL3      1
    P3        SEC1      1              HORIZON   1
    I3        COST      0.25           BAL3      -1
    I3        BAL4      1
    P4        COST      3.55           BAL4      1
    P4        SEC1      1              HORIZON   1
    I4        COST      0.25           BAL4      -1
    I4        BAL5      1
    P5        COST      3.91           BAL5      1
    P5        SEC1      1              HORIZON   1
    I5        COST      0.25           BAL5      -1
    I5        BAL6      1
    P6        COST      3.79           BAL6      1
    P6        SEC1      1              HORIZON   1
    I6        COST      0.25           BAL6      -1
    I6        BAL7      1
    P7        COST      3.98           BAL7      1
    P7        SEC2      1              HORIZON   1
    I7        COST      0.25           BAL7      -1
    I7        BAL8      1
    P8        COST      4.98           BAL8      1
    P8        SEC2      1              HORIZON   1
    I8        COST      0.25           BAL8      -1
    I8        BAL9      1
    P9        COST      3.73           BAL9      1
    P9        SEC2      1              HORIZON   1
    I9        COST      0.25           BAL9      -1
    I9        BAL10     1
    P10       COST      2.43           BAL10     1
    P10       SEC2      1              HORIZON   1
    I10       COST      0.25           BAL10     -1
    I10       BAL11     1
    P11       COST      4.08           BAL11     1
    P11       SEC2      1              HORIZON   1
    I11       COST      0.25           BAL11     -1
    I11       BAL12     1
    P12       COST      4.07           BAL12     1
    P12       SEC2      1              HORIZON   1
    I12       COST      0.25           BAL12     -1
    I12       BAL13     1
    P13       COST      4.56           BAL13     1
    P13       SEC3      1              HORIZON   1
    I13       COST      0.25           BAL13     -1
    I13       BAL14     1
    P14       COST      4.04           BAL14     1
    P14       SEC3      1              HORIZON   1
    I14       COST      0.25           BAL14     -1
    I14       BAL15     1
    P15       COST      2.97           BAL15     1
    P15       SEC3      1              HORIZON   1
    I15       COST      0.25           BAL15     -1
    I15       BAL16     1
    P16       COST      2.12           BAL16     1
    P16       SEC3      1              HORIZON   1
    I16       COST      0.25           BAL16     -1
    I16       BAL17     1
    P17       COST      3.34           BAL17     1
    P17       SEC3      1              HORIZON   1
    I17       COST      0.25           BAL17     -1
    I17       BAL18     1
    P18       COST      3.88           BAL18     1
    P18       SEC3      1              HORIZON   1
    I18       COST      0.25           BAL18     -1
RHS
    RHS       BAL1      8.5            BAL2      4.3
    RHS       BAL3      7.4            BAL4      6.4
    RHS       BAL5      7.4            BAL6      4.2
    RHS       BAL7      4.3            BAL8      4.9
    RHS       BAL9      8.9            BAL10     5.5
    RHS       BAL11     7              BAL12     8.9
    RHS       BAL13     7.5            BAL14     5.1
    RHS       BAL15     6.1            BAL16     4.5
    RHS       BAL17     5.4            BAL18     5.5
    RHS       SEC1      38.2           SEC2      39.5
    RHS       SEC3      34.1           HORIZON   111.8
BOUNDS
 UP BND       P1        8.4            
 FR BND       I1
 UP BND       P2        8.4            
 FR BND       I2
 UP BND       P3        8.4            
 FR BND       I3
 UP BND       P4        8.4            
 FR BND       I4
 UP BND       P5        8.4            
 FR BND       I5
 UP BND       P6        8.4            
 FR BND       I6
 UP BND       P7        8.4            
 FR BND       I7
 UP BND       P8        8.4            
 FR BND       I8
 UP BND       P9        8.4            
 FR BND       I9
 UP BND       P10       8.4            
 FR BND       I10
 UP BND       P11       8.4            
 FR BND       I11
 UP BND       P12       8.4            
 FR BND       I12
 UP BND       P13       8.4            
 FR BND       I13
 UP BND       P14       8.4            
 FR BND       I14
 UP BND       P15       8.4            
 FR BND       I15
 UP BND       P16       8.4            
 FR BND       I16
 UP BND       P17       8.4            
 FR BND       I17
 UP BND       P18       8.4            
 FR BND       I18
ENDATA
