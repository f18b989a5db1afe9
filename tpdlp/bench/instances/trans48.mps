* Transportation: 6 plants x 8 markets, unbalanced.
NAME          TRANS48
ROWS
 N  SHIPCOST
 L  SUP1
 L  SUP2
 L  SUP3
 L  SUP4
 L  SUP5
 L  SUP6
 G  DEM1
 G  DEM2
 G  DEM3
 G  DEM4
 G  DEM5
 G  DEM6
 G  DEM7
 G  DEM8
COLUMNS
    T11       SHIPCOST  9.5            SUP1      1
    T11       DEM1      1
    T12       SHIPCOST  12.8           SUP1      1
    T12       DEM2      1
    T13       SHIPCOST  11.3           SUP1      1
    T13       DEM3      1
    T14       SHIPCOST  4.7            SUP1      1
    T14       DEM4      1
    T15       SHIPCOST  5.6            SUP1      1
    T15       DEM5      1
    T16       SHIPCOST  12.5           SUP1      1
    T16       DEM6      1
    T17       SHIPCOST  2.1            SUP1      1
    T17       DEM7      1
    T18       SHIPCOST  11.9           SUP1      1
    T18       DEM8      1
    T21       SHIPCOST  11.6           SUP2      1
    T21       DEM1      1
    T22       SHIPCOST  7.6            SUP2      1
    T22       DEM2      1
    T23       SHIPCOST  5.6            SUP2      1
    T23       DEM3      1
    T24       SHIPCOST  5.3            SUP2      1
    T24       DEM4      1
    T25       SHIPCOST  5.1            SUP2      1
    T25       DEM5      1
    T26       SHIPCOST  7.3            SUP2      1
    T26       DEM6      1
    T27       SHIPCOST  8.1            SUP2      1
    T27       DEM7      1
    T28       SHIPCOST  8.6            SUP2      1
    T28       DEM8      1
    T31       SHIPCOST  13.9           SUP3      1
    T31       DEM1      1
    T32       SHIPCOST  11.5           SUP3      1
    T32       DEM2      1
    T33       SHIPCOST  9.5            SUP3      1
    T33       DEM3      1
    T34       SHIPCOST  13.9           SUP3      1
    T34       DEM4      1
    T35       SHIPCOST  4.6            SUP3      1
    T35       DEM5      1
    T36       SHIPCOST  3.9            SUP3      1
    T36       DEM6      1
    T37       SHIPCOST  9.4            SUP3      1
    T37       DEM7      1
    T38       SHIPCOST  2.5            SUP3      1
    T38       DEM8      1
    T41       SHIPCOST  2.4            SUP4      1
    T41       DEM1      1
    T42       SHIPCOST  8.2            SUP4      1
    T42       DEM2      1
    T43       SHIPCOST  7.6            SUP4      1
    T43       DEM3      1
    T44       SHIPCOST  13             SUP4      1
    T44       DEM4      1
    T45       SHIPCOST  9.6            SUP4      1
    T45       DEM5      1
    T46       SHIPCOST  8.2            SUP4      1
    T46       DEM6      1
    T47       SHIPCOST  8              SUP4      1
    T47       DEM7      1
    T48       SHIPCOST  5              SUP4      1
    T48       DEM8      1
    T51       SHIPCOST  2.1            SUP5      1
    T51       DEM1      1
    T52       SHIPCOST  4.3            SUP5      1
    T52       DEM2      1
    T53       SHIPCOST  10.3           SUP5      1
    T53       DEM3      1
    T54       SHIPCOST  4.4            SUP5      1
    T54       DEM4      1
    T55       SHIPCOST  6.4            SUP5      1
    T55       DEM5      1
    T56       SHIPCOST  2              SUP5      1
    T56       DEM6      1
    T57       SHIPCOST  12             SUP5      1
    T57       DEM7      1
    T58       SHIPCOST  3.9            SUP5      1
    T58       DEM8      1
    T61       SHIPCOST  5.2            SUP6      1
    T61       DEM1      1
    T62       SHIPCOST  12.6           SUP6      1
    T62       DEM2      1
    T63       SHIPCOST  8.1            SUP6      1
    T63       DEM3      1
    T64       SHIPCOST  12.2           SUP6      1
    T64       DEM4      1
    T65       SHIPCOST  9.7            SUP6      1
    T65       DEM5      1
    T66       SHIPCOST  10.9           SUP6      1
    T66       DEM6      1
    T67       SHIPCOST  3.1            SUP6      1
    T67       DEM7      1
    T68       SHIPCOST  8.5            SUP6      1
    T68       DEM8      1
RHS
    RHS       SUP1      420            SUP2      380
    RHS       SUP3      510            SUP4      290
    RHS       SUP5      460            SUP6      350
    RHS       DEM1      230            DEM2      260
    RHS       DEM3      240            DEM4      310
    RHS       DEM5      220            DEM6      270
    RHS       DEM7      250            DEM8      240
BOUNDS
 FX BND       T18       0              
 UP BND       T31       120            
 UP BND       T32       120            
 UP BND       T33       120            
 UP BND       T34       120            
 UP BND       T35       120            
 UP BND       T36       120            
 UP BND       T37       120            
 UP BND       T38       120            
ENDATA
